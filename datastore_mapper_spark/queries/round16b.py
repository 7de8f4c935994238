"""Round-16 fourth wave: the statistical-LM ladder completed
(interpolated Kneser-Ney — the n-gram state of the art — plus
Good-Turing unseen-mass accounting and CCNet-style perplexity
bucketing of the corpus), tokenizer fertility accounting, hard-negative
mining for contrastive training, and two graph-clustering tiers the
near-dup graph family lacked: deterministic synchronous label
propagation (community detection) and generalized DBSCAN
(core/border/noise semantics — Sander et al.'s GDBSCAN, public
knowledge — over the materialized Jaccard ε-neighborhood graph).

House rules (SURVEY §7.3-H2/H3): exact integer / DECIMAL sufficient
statistics everywhere, ONE token-identical double expression rounded
4-6 dp at the end; per-row doubles that feed a downstream SUM are
quantized to DECIMAL(18,6) first so the sum is associative and
engine-exact; ordering seams get explicit id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "kneser_ney_bigram_perplexity",
    "LLM-pipeline/text",
    oracle="""
    WITH toks AS (
        SELECT lang, string_split(text, ' ') AS t FROM documents
    ), bigrams AS (
        SELECT lang, t[i.i] AS w1, t[i.i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
    ), c12 AS (
        SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY lang, w1, w2
    ), fw AS (
        SELECT lang, w1,
               CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1_fw
        FROM c12 GROUP BY lang, w1
    ), bw AS (
        SELECT lang, w2, CAST(count(*) AS BIGINT) AS n1_bw
        FROM c12 GROUP BY lang, w2
    ), tt AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_types
        FROM c12 GROUP BY lang
    )
    SELECT a.lang,
           CAST(sum(a.c12) AS BIGINT) AS n_bigrams,
           max(t.n_types) AS n_types,
           round(exp(-sum(a.c12 * ln(
                     (a.c12 - 0.75) / f.c1
                     + (0.75 * f.n1_fw / f.c1)
                       * (CAST(b.n1_bw AS DOUBLE) / t.n_types)))
                     / sum(a.c12)), 4) AS kn_perplexity
    FROM c12 a
    JOIN fw f ON a.lang = f.lang AND a.w1 = f.w1
    JOIN bw b ON a.lang = b.lang AND a.w2 = b.w2
    JOIN tt t ON a.lang = t.lang
    GROUP BY a.lang HAVING sum(a.c12) > 0
    ORDER BY a.lang
    """,
)
def kneser_ney_bigram_perplexity(spark, sf_dir):
    """Interpolated KNESER-NEY bigram perplexity per language — the
    n-gram smoothing state of the art (Kneser & Ney 1995; Chen &
    Goodman 1998), one modeling rung above the existing add-one row
    ``bigram_perplexity_by_lang``: the backoff weight is the
    CONTINUATION count N1+(.,w2) (in how many distinct contexts does
    w2 appear), not the raw unigram count, which is what makes KN the
    standard LM behind CCNet-style corpus quality filters.

    P(w2|w1) = (c12 - D)/c1 + (D * N1+(w1,.)/c1) * N1+(.,w2)/T with
    the canonical discount D = 0.75; every observed bigram has
    c12 >= 1 > D and N1+(.,w2) >= 1, so P > 0 without clamping.
    Counts (c12, c1, forward/backward type counts, T) are exact
    integers from three count tiers over the SAME shuffle key family
    (lang,w1)/(lang,w2); the cross-entropy sum runs over bigram TYPES
    (dictionary tier) and the final exp(-sum/N) rounds to 4 dp — the
    type-tier double fold's error is ~1e-12, four orders under the
    round.  At 100 TB this is the standard distributed KN estimation
    plan: explode -> count tiers -> two key-local joins (the backward
    join shuffles on (lang,w2), everything else reuses (lang,w1));
    nothing touches the driver."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split(F.col("text"), " ").alias("t"))
    bigrams = toks.select(
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1,
                        F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))").alias("w2"),
            )
        ).alias("bg"),
    ).select("lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bigrams.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12"))
    fw = c12.groupBy("lang", "w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("n1_fw"))
    bw = c12.groupBy("lang", "w2").agg(
        F.count("*").cast("bigint").alias("n1_bw"))
    tt = c12.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_types"))
    p = ((F.col("c12") - 0.75) / F.col("c1")
         + (F.lit(0.75) * F.col("n1_fw") / F.col("c1"))
         * (F.col("n1_bw").cast("double") / F.col("n_types")))
    return (
        c12.join(fw, ["lang", "w1"])
        .join(bw, ["lang", "w2"])
        .join(F.broadcast(tt), "lang")
        .groupBy("lang")
        .agg(
            F.sum("c12").cast("bigint").alias("n_bigrams"),
            F.max("n_types").alias("n_types"),
            F.round(
                F.exp(-F.sum(F.col("c12") * F.log(p)) / F.sum("c12")),
                4).alias("kn_perplexity"),
        )
        .filter(F.col("n_bigrams") > 0)
        .orderBy("lang")
    )


@query(
    "good_turing_mass_by_lang",
    "LLM-pipeline/text",
    oracle="""
    WITH tf AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY lang, tok
    ), fof AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        FROM tf GROUP BY lang
    )
    SELECT lang, n_types, n_tokens, n1,
           round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p0_unseen_mass,
           CASE WHEN n1 > 0
                THEN round(2.0 * n2 / n1, 4) END AS r_star_1,
           CASE WHEN n2 > 0
                THEN round(3.0 * n3 / n2, 4) END AS r_star_2,
           CASE WHEN n3 > 0
                THEN round(4.0 * n4 / n3, 4) END AS r_star_3
    FROM fof
    WHERE n_tokens > 0
    ORDER BY lang
    """,
)
def good_turing_mass_by_lang(spark, sf_dir):
    """GOOD-TURING frequency-of-frequencies accounting per language:
    the unseen-probability mass P0 = N1/N (the Good-Turing estimate of
    how much of the language the corpus has NOT seen — the classic
    coverage diagnostic for a training corpus) and the adjusted counts
    r* = (r+1)·N(r+1)/N(r) for r = 1..3 (Good 1953; the smoothing that
    Katz backoff and SGT build on — the missing rung between the
    add-one and Kneser-Ney rows).  Two exact count tiers (token ->
    type counts -> frequency-of-frequency rollup); every output is an
    integer until the four guarded ratio expressions, each one double
    division rounded 4-6 dp.  Degenerate cells (N(r) = 0) yield NULL
    under identical CASE guards on both engines.  Scale: one shuffle
    on (lang, tok) then a dictionary-tier rollup — the canonical
    distributed fof plan."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    def _nr(r):
        return F.sum(F.when(F.col("c") == r, 1).otherwise(0)) \
                .cast("bigint")
    fof = tf.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        _nr(1).alias("n1"), _nr(2).alias("n2"),
        _nr(3).alias("n3"), _nr(4).alias("n4"),
    )
    def _rstar(r, lo, hi):
        return F.when(
            F.col(lo) > 0,
            F.round(F.lit(float(r + 1)) * F.col(hi) / F.col(lo), 4))
    return (
        fof.filter(F.col("n_tokens") > 0)
        .select(
            "lang", "n_types", "n_tokens", "n1",
            F.round(F.col("n1").cast("double") / F.col("n_tokens"), 6)
            .alias("p0_unseen_mass"),
            _rstar(1, "n1", "n2").alias("r_star_1"),
            _rstar(2, "n2", "n3").alias("r_star_2"),
            _rstar(3, "n3", "n4").alias("r_star_3"),
        )
        .orderBy("lang")
    )


@query(
    "tokenizer_fertility_by_lang",
    "LLM-pipeline/tokenizer",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
                   AS n_sub,
               CAST((SELECT coalesce(sum(len(s)), 0)
                     FROM unnest(regexp_extract_all(text, '[a-z0-9]+'))
                          AS u(s)) AS BIGINT) AS sub_chars
        FROM documents
    )
    SELECT lang,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_sub) AS BIGINT) AS total_subtokens,
           round(CAST(sum(n_sub) AS DOUBLE) / sum(n_words), 4)
               AS fertility,
           round(CAST(sum(sub_chars) AS DOUBLE) / sum(n_sub), 4)
               AS chars_per_token
    FROM per_doc
    GROUP BY lang
    HAVING sum(n_words) > 0 AND sum(n_sub) > 0
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """TOKENIZER FERTILITY per language — subtokens emitted per
    whitespace word and characters per subtoken, under the house
    BPE-ish regex pre-tokenizer ('[a-z0-9]+', the same one
    ``token_count_regex`` counts globally).  Fertility is the standard
    cross-lingual tokenizer-cost metric (a language tokenizing at 2x
    fertility pays 2x the context budget), and chars/token is its
    compression-rate dual — both belong in any corpus mixture report
    next to the oov row.  All counts are exact integers folded
    JVM-side (transform+aggregate over the extracted array — no
    explode, no Python); two double divisions at the end, rounded
    4 dp.  Scale: embarrassingly parallel per-document map then a
    dictionary-tier lang rollup — no joins at all."""
    d = table(spark, sf_dir, "documents")
    sub = F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        F.size(sub).cast("bigint").alias("n_sub"),
        F.aggregate(
            F.transform(sub, lambda s: F.length(s).cast("bigint")),
            F.lit(0).cast("bigint"), lambda acc, x: acc + x,
        ).alias("sub_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_sub").cast("bigint").alias("total_subtokens"),
            F.round(F.sum("n_sub").cast("double") / F.sum("n_words"), 4)
            .alias("fertility"),
            F.round(F.sum("sub_chars").cast("double") / F.sum("n_sub"), 4)
            .alias("chars_per_token"),
        )
        .filter((F.col("total_words") > 0) & (F.col("total_subtokens") > 0))
        .orderBy("lang")
    )


@query(
    "ccnet_perplexity_buckets",
    "LLM-pipeline/quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t
        FROM documents
    ), bigrams AS (
        SELECT doc_id, lang, t[i.i] AS w1, t[i.i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
    ), c12 AS (
        SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY lang, w1, w2
    ), c1 AS (
        SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1
        FROM c12 GROUP BY lang, w1
    ), vocab AS (
        SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY lang
    ), scored AS (
        SELECT g.doc_id, g.lang,
               CAST(round(ln((a.c12 + 1.0) / (b.c1 + v.v)), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM bigrams g
        JOIN c12 a ON g.lang = a.lang AND g.w1 = a.w1 AND g.w2 = a.w2
        JOIN c1 b ON g.lang = b.lang AND g.w1 = b.w1
        JOIN vocab v ON g.lang = v.lang
    ), per_doc AS (
        SELECT s.doc_id, s.lang,
               -CAST(CAST(sum(s.lp) AS DECIMAL(38,6)) AS DOUBLE)
                   / count(*) AS ce
        FROM scored s GROUP BY s.doc_id, s.lang
    ), bucketed AS (
        SELECT p.lang, p.ce, d.n_chars,
               ntile(3) OVER (PARTITION BY p.lang
                              ORDER BY p.ce, p.doc_id) AS bucket
        FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(ce), 4) AS mean_ce
    FROM bucketed
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNET-STYLE PERPLEXITY BUCKETING (Wenzek et al. 2020, public):
    score every document's cross-entropy under its language's corpus
    bigram LM (add-one, the same model as
    ``bigram_perplexity_by_lang`` applied per document), then split
    each language into HEAD / MIDDLE / TAIL thirds by perplexity —
    the curation split CCNet feeds to pretraining (head = most
    fluent).  Output: per (lang, bucket) document count, character
    budget, and mean cross-entropy.

    Determinism engineering: the per-occurrence log-prob is rounded to
    DECIMAL(18,6) BEFORE the per-document sum (the
    ``unigram_logprob_score`` quantize-then-sum pattern), so each
    document's cross-entropy is ENGINE-EXACT — the ntile boundary
    ordering (ce, doc_id) is then decided on identical values, never
    on a last-ulp double seam.  Docs with no bigram (< 2 tokens) are
    excluded on both engines by the scoring join itself.  Scale: LM
    tiers shuffle on (lang,w1[,w2]); scoring is a key-local join of
    doc bigrams to those tiers; the ntile is one window per language
    — at 100 TB swap ntile for the two-pass percentile split the
    repo's ``histogram_equi_depth`` documents."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("t"))
    bigrams = toks.select(
        "doc_id", "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1,
                        F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))").alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", "lang",
             F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bigrams.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12"))
    c1 = c12.groupBy("lang", "w1").agg(
        F.sum("c12").cast("bigint").alias("c1"))
    vocab = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    lp = (
        F.round(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 6)
        .cast("decimal(18,6)").alias("lp")
    )
    scored = (
        bigrams.join(c12, ["lang", "w1", "w2"])
        .join(c1, ["lang", "w1"])
        .join(F.broadcast(vocab), "lang")
        .select("doc_id", "lang", lp)
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        (-F.sum("lp").cast("decimal(38,6)").cast("double")
         / F.count("*")).alias("ce"))
    w = Window.partitionBy("lang").orderBy("ce", "doc_id")
    bucketed = (
        per_doc.join(d.select("doc_id", "n_chars"), "doc_id")
        .select("lang", "ce", "n_chars",
                F.ntile(3).over(w).cast("bigint").alias("bucket"))
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg("ce"), 4).alias("mean_ce"),
        )
        .orderBy("lang", "bucket")
    )


@query(
    "hard_negative_mining_top5",
    "LLM-pipeline",
    oracle="""
    WITH anchors AS (
        SELECT vec_id AS anchor_id, label AS a_label,
               embedding AS ae,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS aa
        FROM embeddings WHERE vec_id % 50 = 0
    ), sims AS (
        SELECT a.anchor_id, e.vec_id AS neighbor_id,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x,
                             unnest(a.ae) AS y)) AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS ee,
               a.aa AS aa
        FROM embeddings e, anchors a
        WHERE e.label <> a.a_label
    ), ranked AS (
        SELECT anchor_id, neighbor_id,
               dot / (sqrt(ee) * sqrt(aa)) AS sim,
               row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY dot / (sqrt(ee) * sqrt(aa)) DESC,
                            neighbor_id) AS rnk
        FROM sims
    )
    SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
           round(sim, 4) AS sim
    FROM ranked WHERE rnk <= 5
    ORDER BY anchor_id, rnk
    """,
)
def hard_negative_mining_top5(spark, sf_dir):
    """HARD-NEGATIVE MINING for contrastive / embedding training:
    for each anchor vector (every 50th id), the top-5 most
    cosine-similar vectors with a DIFFERENT label — the negatives
    that sit closest to the decision boundary, which is exactly what
    contrastive fine-tuning (SimCSE/DPR-style, public) samples.  The
    anchor batch is broadcast and scored against the corpus with
    JVM ``zip_with``/``aggregate`` dot products (no Python); top-5
    per anchor is a window row_number with (sim DESC, vec_id)
    tie-break over doubles both engines fold in array order, so ranks
    are bitwise-decided.  Scale: the brute-force anchor-batch scan is
    the calibration tier (cost |anchors| x corpus, embarrassingly
    parallel, TakeOrderedAndProject-shaped per anchor); the
    production tier restricts candidates to the anchor's IVF probe
    set (operators/similarity.py) — same contract, bucketed cost."""
    e = table(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with("embedding", "ae",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    norm2 = F.aggregate(
        F.transform("embedding",
                    lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    anchors = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("anchor_id"),
                F.col("label").alias("a_label"),
                F.col("embedding").alias("ae"),
                norm2.alias("aa"))
    )
    sims = (
        e.join(F.broadcast(anchors), F.col("label") != F.col("a_label"))
        .select("anchor_id",
                F.col("vec_id").alias("neighbor_id"),
                (dot / (F.sqrt(norm2) * F.sqrt(F.col("aa"))))
                .alias("sim"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("anchor_id", "rnk", "neighbor_id",
                F.round("sim", 4).alias("sim"))
        .orderBy("anchor_id", "rnk")
    )


# The oracle-side near-dup edge construction, shared with the existing
# graph family (dedup_cluster_assign et al.): exact Jaccard >= 0.8 over
# per-document token SETS via the inverted-index join.  Every stage is
# AS MATERIALIZED: DuckDB 1.0 INLINES a CTE at each reference site, and
# the multi-level consumers below (4 unrolled LPA rounds; the GDBSCAN
# degree/core/border stages) reference `sym` many times — without
# materialization the token self-join re-executes per reference and the
# unrolled levels compound it exponentially (observed: the sf0.1 LPA
# oracle ran 100+ CPU-minutes inlined vs seconds materialized).
_EDGES_CTE = """
    toks AS MATERIALIZED (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
    ), sizes AS MATERIALIZED (
        SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id
    ), cand AS MATERIALIZED (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), edges AS MATERIALIZED (
        SELECT d1, d2
        FROM cand p
        JOIN sizes s1 ON p.d1 = s1.doc_id
        JOIN sizes s2 ON p.d2 = s2.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (s1.sz + s2.sz - p.inter) >= 0.8
    ), sym AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM edges
        UNION ALL SELECT d2, d1 FROM edges
    )
"""


@query(
    "graph_label_propagation",
    "LLM-pipeline/graph",
    oracle="WITH " + _EDGES_CTE + """
    , nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym
    ), l0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes
    ), i1 AS MATERIALIZED (
        SELECT s.u, l.lab, count(*) AS c
        FROM sym s JOIN l0 l ON s.v = l.node GROUP BY s.u, l.lab
    ), l1 AS MATERIALIZED (
        SELECT u AS node, lab FROM (
            SELECT u, lab, row_number() OVER (
                PARTITION BY u ORDER BY c DESC, lab) AS rn FROM i1)
        WHERE rn = 1
    ), i2 AS MATERIALIZED (
        SELECT s.u, l.lab, count(*) AS c
        FROM sym s JOIN l1 l ON s.v = l.node GROUP BY s.u, l.lab
    ), l2 AS MATERIALIZED (
        SELECT u AS node, lab FROM (
            SELECT u, lab, row_number() OVER (
                PARTITION BY u ORDER BY c DESC, lab) AS rn FROM i2)
        WHERE rn = 1
    ), i3 AS MATERIALIZED (
        SELECT s.u, l.lab, count(*) AS c
        FROM sym s JOIN l2 l ON s.v = l.node GROUP BY s.u, l.lab
    ), l3 AS MATERIALIZED (
        SELECT u AS node, lab FROM (
            SELECT u, lab, row_number() OVER (
                PARTITION BY u ORDER BY c DESC, lab) AS rn FROM i3)
        WHERE rn = 1
    ), i4 AS MATERIALIZED (
        SELECT s.u, l.lab, count(*) AS c
        FROM sym s JOIN l3 l ON s.v = l.node GROUP BY s.u, l.lab
    ), l4 AS MATERIALIZED (
        SELECT u AS node, lab FROM (
            SELECT u, lab, row_number() OVER (
                PARTITION BY u ORDER BY c DESC, lab) AS rn FROM i4)
        WHERE rn = 1
    )
    SELECT lab AS community_id,
           CAST(count(*) AS BIGINT) AS size
    FROM l4 GROUP BY lab HAVING count(*) >= 2
    ORDER BY size DESC, community_id
    """,
)
def graph_label_propagation(spark, sf_dir):
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007, public) over the materialized near-dup graph — the
    community tier the graph family lacked (components say WHICH docs
    are transitively linked; LPA splits a weakly-bridged component
    into its dense duplicate communities).  Made fully deterministic
    for oracle comparison: SYNCHRONOUS updates, exactly 4 rounds,
    new label = the most frequent label among neighbors with ties
    broken by MINIMUM label — each round is one join + one count
    aggregation + one (count DESC, label ASC) row_number, identical
    on both engines, so the fixpoint ambiguity of classic async LPA
    never arises.  Output: communities of size >= 2 labeled by their
    surviving seed id.  Scale: each round shuffles on node id over
    the cached parquet edge snapshot; ``localCheckpoint`` cuts the
    4-deep iterative lineage exactly as ``connected_components``
    documents; rounds are a constant (4), not data-dependent."""
    from .llm_text import near_dup_edges
    from ..operators.graph import label_propagation

    edges = near_dup_edges(spark, sf_dir)
    # routed operator (round-16 VERDICT task 4): one-task numpy kernel
    # below the task envelope, the original join+count+row_number loop
    # above it — route equality pinned by
    # tests/test_operators.py::test_label_propagation_routes_agree
    labels = label_propagation(edges, src="d1", dst="d2", rounds=4)
    return (
        labels.groupBy(F.col("lab").alias("community_id"))
        .agg(F.count("*").cast("bigint").alias("size"))
        .filter(F.col("size") >= 2)
        .orderBy(F.col("size").desc(), "community_id")
    )


@query(
    "gdbscan_neardup_clusters",
    "LLM-pipeline/graph",
    oracle="WITH RECURSIVE " + _EDGES_CTE + """
    , deg AS MATERIALIZED (
        SELECT u AS node, count(*) AS deg FROM sym GROUP BY u
    ), core AS MATERIALIZED (
        SELECT node FROM deg WHERE deg >= 2
    ), core_sym AS MATERIALIZED (
        SELECT s.u, s.v FROM sym s
        JOIN core c1 ON s.u = c1.node
        JOIN core c2 ON s.v = c2.node
    ), reach(node, lab) AS (
        SELECT u, u FROM core_sym
        UNION
        SELECT s.u, r.lab FROM core_sym s JOIN reach r ON s.v = r.node
    ), core_cc AS MATERIALIZED (
        SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
    ), core_clusters AS MATERIALIZED (
        SELECT c.node, coalesce(cc.cluster_id, c.node) AS cluster_id
        FROM core c LEFT JOIN core_cc cc ON c.node = cc.node
    ), border AS MATERIALIZED (
        SELECT s.u AS node, min(k.cluster_id) AS cluster_id
        FROM sym s
        JOIN core_clusters k ON s.v = k.node
        WHERE s.u NOT IN (SELECT node FROM core)
        GROUP BY s.u
    ), per_cluster AS MATERIALIZED (
        SELECT coalesce(c.cluster_id, b.cluster_id) AS cluster_id,
               CAST(coalesce(c.n_core, 0) AS BIGINT) AS n_core,
               CAST(coalesce(b.n_border, 0) AS BIGINT) AS n_border
        FROM (SELECT cluster_id, count(*) AS n_core
              FROM core_clusters GROUP BY cluster_id) c
        FULL OUTER JOIN
             (SELECT cluster_id, count(*) AS n_border
              FROM border GROUP BY cluster_id) b
        ON c.cluster_id = b.cluster_id
    ), noise AS MATERIALIZED (
        SELECT CAST(-1 AS BIGINT) AS cluster_id,
               CAST(0 AS BIGINT) AS n_core, CAST(0 AS BIGINT) AS n_border,
               CAST((SELECT count(*) FROM documents)
                    - (SELECT count(*) FROM core_clusters)
                    - (SELECT count(*) FROM border) AS BIGINT) AS size
    )
    SELECT cluster_id, n_core, n_border, n_core + n_border AS size
    FROM per_cluster
    UNION ALL
    SELECT cluster_id, n_core, n_border, size FROM noise WHERE size > 0
    ORDER BY cluster_id
    """,
)
def gdbscan_neardup_clusters(spark, sf_dir):
    """GENERALIZED DBSCAN (Sander et al. 1998, public) over the
    materialized Jaccard ε-neighborhood graph: neighborhood =
    Jaccard >= 0.8 partners (the cached lossless inverted-index edge
    snapshot), minPts = 3 counting the point itself — so CORE docs
    have >= 2 graph neighbors, BORDER docs are non-core with a core
    neighbor (assigned the minimum adjacent core cluster), everything
    else is NOISE.  Clusters are connected components of the
    core-core subgraph ONLY (density-reachability: border docs never
    bridge two clusters — the semantic difference from the plain
    ``dedup_cluster_assign`` components row), labeled by minimum core
    id.  Output: per-cluster core/border/size rows plus one
    cluster_id = -1 noise row.  Scale: degree count + two semi-joins
    + the repo's iterative min-label CC (localCheckpoint-cut, shallow
    dup components converge in 2-4 rounds) — every step shuffles on
    doc id; the noise count is an anti-join, not a driver loop."""
    from ..operators.dedup import connected_components
    from .llm_text import near_dup_edges

    d = table(spark, sf_dir, "documents")
    edges = near_dup_edges(spark, sf_dir).localCheckpoint()
    sym = (
        edges.select(F.col("d1").alias("u"), F.col("d2").alias("v"))
        .union(edges.select(F.col("d2").alias("u"), F.col("d1").alias("v")))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    core = deg.filter(F.col("deg") >= 2).select(F.col("u").alias("node"))
    core_edges = (
        edges.join(core.withColumnRenamed("node", "d1"), "d1", "semi")
        .join(core.withColumnRenamed("node", "d2"), "d2", "semi")
        .select("d1", "d2")
    )
    cc = connected_components(core_edges)
    core_clusters = (
        core.join(cc, "node", "left")
        .select("node", F.coalesce("cluster_id", "node").alias("cluster_id"))
        .localCheckpoint()
    )
    border = (
        sym.join(core, sym.u == core.node, "anti")
        .join(core_clusters.withColumnRenamed("node", "v"), "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("cluster_id").alias("cluster_id"))
        .localCheckpoint()
    )
    per_cluster = (
        core_clusters.groupBy("cluster_id")
        .agg(F.count("*").cast("bigint").alias("n_core"))
        .join(border.groupBy("cluster_id")
              .agg(F.count("*").cast("bigint").alias("n_border")),
              "cluster_id", "full")
        .select(
            "cluster_id",
            F.coalesce("n_core", F.lit(0)).cast("bigint").alias("n_core"),
            F.coalesce("n_border", F.lit(0)).cast("bigint")
            .alias("n_border"),
        )
        .withColumn("size", (F.col("n_core") + F.col("n_border"))
                    .cast("bigint"))
    )
    members = (
        core_clusters.select("node")
        .union(border.select("node"))
    )
    noise = (
        d.select(F.col("doc_id").alias("node"))
        .join(members, "node", "anti")
        .agg(F.count("*").cast("bigint").alias("size"))
        .select(F.lit(-1).cast("bigint").alias("cluster_id"),
                F.lit(0).cast("bigint").alias("n_core"),
                F.lit(0).cast("bigint").alias("n_border"),
                "size")
        .filter(F.col("size") > 0)
    )
    return per_cluster.unionByName(noise).orderBy("cluster_id")


@query(
    "jl_rerank_verified",
    "LLM-pipeline",
    oracle="""
    WITH q AS (
        SELECT embedding AS qe,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS qq
        FROM embeddings WHERE vec_id = 2
    ), sims AS (
        SELECT e.vec_id,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x, unnest(q.qe) AS y))
                 AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS dd,
               q.qq AS qq
        FROM embeddings e, q
        WHERE e.vec_id <> 2
    )
    SELECT vec_id, round(dot / (sqrt(dd) * sqrt(qq)), 4) AS sim,
           TRUE AS quality_ok
    FROM sims
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def jl_rerank_verified(spark, sf_dir):
    """JOHNSON-LINDENSTRAUSS sketch tier, recall-verified (the fifth
    rung of the ANN ladder next to IVF / PQ / SQ8 / BQ — those
    compress per-dimension precision; JL compresses DIMENSIONALITY):
    a deterministic Rademacher +-1 projection (Achlioptas 2003,
    public) maps 64-d float vectors to 32-d doubles entirely inside
    JVM higher-order functions; the candidate pool is the projected
    space's top-200 by projected cosine, and the exact scorer reranks
    only that pool — the standard prefilter->rerank production shape
    (operators/similarity.py jl_project/jl_topk).

    Verification follows the ``sq8_knn_recall_verified`` pattern: the
    hashed rows are the EXACT brute-force cosine top-10 for query
    vec_id=2 (restated by the oracle from raw arrays); ``quality_ok``
    grades that the reranked top-10's summed exact similarity reaches
    85% of the exact top-10's (measured 0.95 / 0.96 / 0.92 at
    sf0.001 / 0.01 / 0.1 on this isotropic fixture — the hardest case
    for any sketch, since true neighbors are separated by last-percent
    margins).  Scale: the projected corpus is 32/64 of the resident
    footprint, the pool rerank touches 200 full vectors per query,
    and every stage is TakeOrderedAndProject-shaped — no global
    sort, nothing driver-side."""
    from ..operators import similarity as sim

    e = table(spark, sf_dir, "embeddings")
    exact = sim.cosine_topk(e, query_id=2, k=10)
    cand = sim.jl_topk(e, query_id=2, k=200, out_dim=32)
    q = (e.filter(F.col("vec_id") == 2)
         .select(F.col("embedding").alias("qe")))
    reranked = (
        e.join(cand.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id",
                F.round(sim.cosine(F.col("embedding"), F.col("qe")), 4)
                .alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )
    mass = (
        reranked.agg(F.sum("sim").alias("jl_mass"))
        .crossJoin(exact.agg(F.sum("sim").alias("exact_mass")))
    )
    return exact.crossJoin(F.broadcast(mass)).select(
        "vec_id", "sim",
        (F.col("jl_mass") >= 0.85 * F.col("exact_mass"))
        .alias("quality_ok"),
    )


@query(
    "average_precision_exact",
    "ml-eval",
    oracle="""
    WITH t AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), g AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(y) AS BIGINT) AS tp_g
        FROM t GROUP BY s
    ), cum AS (
        SELECT s, n_g, tp_g,
               sum(tp_g) OVER (ORDER BY s DESC
                               ROWS UNBOUNDED PRECEDING) AS cum_tp,
               sum(n_g) OVER (ORDER BY s DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(tp_g) OVER () AS p,
               sum(n_g) OVER () AS n
        FROM g
    ), terms AS (
        SELECT p, n,
               CAST(round((CAST(tp_g AS DOUBLE) / p)
                          * (CAST(cum_tp AS DOUBLE) / cum_n), 12)
                    AS DECIMAL(28,12)) AS term
        FROM cum WHERE p > 0
    )
    SELECT CAST(max(p) AS BIGINT) AS n_pos,
           CAST(max(n) - max(p) AS BIGINT) AS n_neg,
           round(CAST(sum(term) AS DOUBLE), 6) AS average_precision
    FROM terms
    HAVING count(*) > 0
    """,
)
def average_precision_exact(spark, sf_dir):
    """EXACT AVERAGE PRECISION (area under the precision-recall
    curve, interpolation-free — the sklearn ``average_precision_score``
    definition: AP = Σ_thresholds ΔRecall·Precision) for the same
    classifier setup as the ROC row ``binary_auc_exact``: score =
    order value in exact cents, positive class = finished orders —
    PR-AUC is THE companion metric under class imbalance, where
    ROC-AUC flatters.  Tie-safe by construction: thresholds are
    score GROUPS (no within-tie ordering exists to disagree on), the
    cumulative TP/N prefix runs over the score dictionary, and each
    threshold's ΔR·P term is quantized to DECIMAL(28,12) BEFORE the
    final sum (the quantize-then-sum house rule), so the AP is
    engine-exact at 6 dp with no float-fold seam.  Scale: one
    group-by on score, one window over the score dictionary (two-pass
    percentile shape at 100 TB, as ``histogram_equi_depth``
    documents), one exact decimal reduction."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("s"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = t.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("y").cast("bigint").alias("tp_g"),
    )
    w_cum = Window.orderBy(F.col("s").desc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = g.select(
        "n_g", "tp_g",
        F.sum("tp_g").over(w_cum).alias("cum_tp"),
        F.sum("n_g").over(w_cum).alias("cum_n"),
        F.sum("tp_g").over(w_all).alias("p"),
        F.sum("n_g").over(w_all).alias("n"),
    )
    term = (
        F.round((F.col("tp_g").cast("double") / F.col("p"))
                * (F.col("cum_tp").cast("double") / F.col("cum_n")), 12)
        .cast("decimal(28,12)")
    )
    return (
        cum.filter(F.col("p") > 0)
        .select("p", "n", term.alias("term"))
        .agg(
            F.max("p").cast("bigint").alias("n_pos"),
            (F.max("n") - F.max("p")).cast("bigint").alias("n_neg"),
            F.round(F.sum("term").cast("double"), 6)
            .alias("average_precision"),
        )
        .filter(F.col("n_pos").isNotNull())
    )


@query(
    "ndcg_exact",
    "ml-eval",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
        FROM documents
    ), sys AS (
        SELECT rel,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
        FROM scored
    ), ideal AS (
        SELECT rel,
               row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
        FROM scored
    ), dcg AS (
        SELECT CAST(sum(CAST(round(
                   rel / (ln(rnk + 1) / ln(2)), 12)
                   AS DECIMAL(18,12))) AS DECIMAL(28,12)) AS dcg
        FROM sys WHERE rnk <= 50
    ), idcg AS (
        SELECT CAST(sum(CAST(round(
                   rel / (ln(rnk + 1) / ln(2)), 12)
                   AS DECIMAL(18,12))) AS DECIMAL(28,12)) AS idcg
        FROM ideal WHERE rnk <= 50
    )
    SELECT CAST(50 AS BIGINT) AS k,
           round(CAST(dcg AS DOUBLE), 6) AS dcg_at_k,
           round(CAST(idcg AS DOUBLE), 6) AS idcg_at_k,
           round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
               AS ndcg_at_k
    FROM dcg, idcg
    WHERE CAST(idcg AS DOUBLE) > 0
    """,
)
def ndcg_exact(spark, sf_dir):
    """EXACT NDCG@50 — the graded-relevance ranking metric completing
    the eval family (ROC-AUC = `binary_auc_exact`, PR-AUC =
    `average_precision_exact`, NDCG here; Järvelin & Kekäläinen 2002,
    public).  Demonstration ranking: documents ordered by length
    (n_chars DESC, doc_id tie-break) as the system, binary relevance
    rel = [lang = 'en']; DCG = Σ rel/log2(rank+1) over the top 50,
    IDCG from the ideal (rel DESC) ordering, NDCG = DCG/IDCG.  Each
    positional term is rounded to DECIMAL(18,12) BEFORE summation
    (the quantize-then-sum house rule) and log2 is spelled
    ln(x)/ln(2) identically on both engines, so the 6-dp metric has
    no float-fold seam.  Rank ties cannot diverge: both orderings
    carry a doc_id tie-break.  Scale: two global-dictionary windows
    (two-pass top-k shape at 100 TB — rank k=50 survives a
    TakeOrderedAndProject per ordering) and a 50-row reduction."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("rel"),
    )
    w_sys = Window.orderBy(F.col("n_chars").desc(), "doc_id")
    w_ideal = Window.orderBy(F.col("rel").desc(), "doc_id")
    log2rank = lambda: F.log(F.col("rnk") + 1) / F.log(F.lit(2.0))  # noqa: E731
    term = (
        F.round(F.col("rel") / log2rank(), 12).cast("decimal(18,12)")
    )
    dcg = (
        scored.withColumn("rnk", F.row_number().over(w_sys))
        .filter(F.col("rnk") <= 50)
        .agg(F.sum(term).cast("decimal(28,12)").alias("dcg"))
    )
    idcg = (
        scored.withColumn("rnk", F.row_number().over(w_ideal))
        .filter(F.col("rnk") <= 50)
        .agg(F.sum(term).cast("decimal(28,12)").alias("idcg"))
    )
    return (
        dcg.crossJoin(idcg)
        .filter(F.col("idcg").cast("double") > 0)
        .select(
            F.lit(50).cast("bigint").alias("k"),
            F.round(F.col("dcg").cast("double"), 6).alias("dcg_at_k"),
            F.round(F.col("idcg").cast("double"), 6).alias("idcg_at_k"),
            F.round(F.col("dcg").cast("double")
                    / F.col("idcg").cast("double"), 6).alias("ndcg_at_k"),
        )
    )


@query(
    "wilson_interval_by_source",
    "statistics",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM documents GROUP BY source
    )
    SELECT source, n, k,
           round((CAST(k AS DOUBLE) / n + 1.9208 / n
                  - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1.0 - CAST(k AS DOUBLE) / n) / n
                                + 0.9604 / (n * CAST(n AS DOUBLE))))
                 / (1.0 + 3.8416 / n), 6) AS wilson_lo,
           round((CAST(k AS DOUBLE) / n + 1.9208 / n
                  + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1.0 - CAST(k AS DOUBLE) / n) / n
                                + 0.9604 / (n * CAST(n AS DOUBLE))))
                 / (1.0 + 3.8416 / n), 6) AS wilson_hi
    FROM g WHERE n > 0
    ORDER BY source
    """,
)
def wilson_interval_by_source(spark, sf_dir):
    """WILSON SCORE 95% confidence interval per source for the
    proportion of long documents (n_chars >= 300, the corpus median
    tier) — the binomial interval that behaves at small n and extreme
    p where the Wald interval collapses (Wilson 1927; the interval
    behind every data-quality dashboard's 'share of X' error bars,
    completing the interval family next to the Poisson-rate and
    two-proportion rows).  (n, k) are exact integers; the bound is
    ONE token-identical double expression with the z = 1.96 constants
    pre-folded (z² = 3.8416, z²/2 = 1.9208, z²/4 = 0.9604), rounded
    6 dp.  Scale: a single shuffled count rollup on source —
    dictionary tier."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0))
        .cast("bigint").alias("k"),
    )
    nD = F.col("n").cast("double")
    p = F.col("k").cast("double") / F.col("n")
    rad = F.sqrt(p * (F.lit(1.0) - p) / F.col("n")
                 + F.lit(0.9604) / (F.col("n") * nD))
    denom = F.lit(1.0) + F.lit(3.8416) / F.col("n")
    center = p + F.lit(1.9208) / F.col("n")
    return (
        g.filter(F.col("n") > 0)
        .select(
            "source", "n", "k",
            F.round((center - F.lit(1.96) * rad) / denom, 6)
            .alias("wilson_lo"),
            F.round((center + F.lit(1.96) * rad) / denom, 6)
            .alias("wilson_hi"),
        )
        .orderBy("source")
    )
