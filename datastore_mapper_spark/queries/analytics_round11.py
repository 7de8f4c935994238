"""Round-11 analytics wave: information-theoretic and robust-statistics
operators not yet covered by the registry — mutual information,
Kendall's tau, Theil–Sen robust slope, Monroe log-odds-with-prior term
scoring, week-over-week audience Jaccard, drawdown-from-peak, and
Poisson rate intervals.

Shared seams (SURVEY §7.3): every money aggregate goes through integer
cents with ``floor()`` stated on BOTH engines; transcendental outputs
(ln/sqrt) are rounded to 6 decimals (JVM Math vs DuckDB libm may
differ in the last ulp — the BM25 precedent); order statistics use an
explicit row_number pick, not engine-specific quantile semantics.

Scale notes: every query aggregates the fact table FIRST (group sizes
are dictionary-tier: langs x sources, nations, days, weeks), so the
pairwise self-joins (Kendall, Theil–Sen) run on tens-to-hundreds of
aggregated rows — never on raw facts.  No global single-partition
windows over fact-tier frames anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


@query(
    "mutual_information_lang_source",
    "analytics/stats",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, source
    ), m AS (
        SELECT lang, source, n,
               sum(n) OVER (PARTITION BY lang) AS nl,
               sum(n) OVER (PARTITION BY source) AS ns,
               sum(n) OVER () AS nn
        FROM cells
    )
    SELECT lang, source, n,
           round((CAST(n AS DOUBLE) / nn)
                 * ln(CAST(n AS DOUBLE) * nn / (CAST(nl AS DOUBLE) * ns)),
                 6) AS mi_term
    FROM m
    """,
)
def mutual_information_lang_source(spark, sf_dir):
    """Pointwise mutual-information decomposition of I(lang; source):
    one row per contingency cell with its additive MI term
    ``p(l,s) * ln(p(l,s) / (p(l) p(s)))`` — the quantity a corpus
    curator reads to see WHICH language/source pairings are
    over/under-represented (the chi-squared query's
    information-theoretic twin).  Marginals come from windows over the
    ALREADY-AGGREGATED cell frame (|langs| x |sources| rows —
    dictionary-tier at any corpus size), so the only fact-table pass
    is the initial groupBy."""
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    nl = F.sum("n").over(Window.partitionBy("lang"))
    ns = F.sum("n").over(Window.partitionBy("source"))
    nn = F.sum("n").over(Window.partitionBy())
    m = cells.select("lang", "source", "n", nl.alias("nl"),
                     ns.alias("ns"), nn.alias("nn"))
    term = (F.col("n").cast("double") / F.col("nn")) * F.log(
        F.col("n").cast("double") * F.col("nn")
        / (F.col("nl").cast("double") * F.col("ns"))
    )
    return m.select("lang", "source", "n", F.round(term, 6).alias("mi_term"))


@query(
    "kendall_tau_yearly_nation_revenue",
    "analytics/stats",
    oracle="""
    WITH rev AS (
        SELECT n.n_name,
               CAST(sum(CASE WHEN year(o.o_orderdate) = 1996
                    THEN CAST(floor(o.o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS r96,
               CAST(sum(CASE WHEN year(o.o_orderdate) = 1997
                    THEN CAST(floor(o.o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS r97
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE year(o.o_orderdate) IN (1996, 1997)
        GROUP BY n.n_name
    ), pairs AS (
        SELECT CASE WHEN sign(a.r96 - b.r96) * sign(a.r97 - b.r97) > 0
                    THEN 1 ELSE 0 END AS conc,
               CASE WHEN sign(a.r96 - b.r96) * sign(a.r97 - b.r97) < 0
                    THEN 1 ELSE 0 END AS disc
        FROM rev a JOIN rev b ON a.n_name < b.n_name
    )
    SELECT CAST((SELECT count(*) FROM rev) AS BIGINT) AS n_nations,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           round(CAST(sum(conc) - sum(disc) AS DOUBLE) / count(*), 6)
               AS tau_a
    FROM pairs
    """,
)
def kendall_tau_yearly_nation_revenue(spark, sf_dir):
    """Kendall's tau-a between nations' 1996 and 1997 revenue rankings
    — the rank-correlation complement to ``spearman_rank_correlation``
    that is robust to any monotone transform and is defined directly
    on concordant/discordant PAIRS.  The pairwise self-join runs on
    the 25-row aggregated nation frame (never on orders), so the
    O(n²) is over n = |nations| — constant at any fact scale.  Exact
    integer-cents comparisons decide concordance; only the final
    ratio is floating point."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    yr = F.year("o_orderdate")
    rev = (
        o.filter(yr.isin(1996, 1997))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.when(yr == 1996, cents).otherwise(0)).alias("r96"),
            F.sum(F.when(yr == 1997, cents).otherwise(0)).alias("r97"),
        )
    )
    a, b = rev.alias("a"), rev.alias("b")
    # sign() before multiplying: the raw cents-delta product overflows
    # int64 at sf0.1 (~1e12 x 1e12) — concordance only needs the signs
    prod = (F.signum((F.col("a.r96") - F.col("b.r96")).cast("double"))
            * F.signum((F.col("a.r97") - F.col("b.r97")).cast("double")))
    # broadcast the |nations|-row side: the non-equi pair join then
    # plans BNLJ over a 25-row build, not an unhinted CartesianProduct
    pairs = a.join(F.broadcast(b),
                   F.col("a.n_name") < F.col("b.n_name")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
    )
    n_nations = rev.agg(F.count("*").alias("n_nations"))
    agg = pairs.agg(
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.count("*").alias("npairs"),
    )
    return n_nations.crossJoin(F.broadcast(agg)).select(
        "n_nations", "concordant", "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("npairs"), 6,
        ).alias("tau_a"),
    )


@query(
    "theil_sen_daily_revenue_slope",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT CAST(datediff('day', DATE '1996-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        GROUP BY 1
    ), slopes AS (
        SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.d - a.d) AS s
        FROM daily a JOIN daily b ON a.d < b.d
    ), ranked AS (
        SELECT s, row_number() OVER (ORDER BY s) AS rn,
               count(*) OVER () AS m
        FROM slopes
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(m AS BIGINT) AS n_pairs,
           round(s, 6) AS median_slope
    FROM ranked WHERE rn = (m + 1) // 2
    """,
)
def theil_sen_daily_revenue_slope(spark, sf_dir):
    """Theil–Sen robust trend estimate over Q1-1996 daily revenue: the
    LOWER MEDIAN of all pairwise slopes — immune to the outlier days
    that wreck the least-squares fit in ``regression_price_trend``
    (its robust twin).  The O(n²) pair join runs on the ~90-row daily
    AGGREGATE (never raw orders), and the median is an explicit
    row_number pick at rank ``(m+1)//2`` so both engines select the
    identical order statistic.  Slopes are exact integer-cent
    differences over integer day gaps; one double division each."""
    o = table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    daily = (
        o.filter((day >= F.lit("1996-01-01")) & (day < F.lit("1996-04-01")))
        .groupBy(F.datediff(day, F.lit("1996-01-01")).cast("bigint").alias("d"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("cents"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        ((F.col("b.cents") - F.col("a.cents")).cast("double")
         / (F.col("b.d") - F.col("a.d"))).alias("s")
    )
    w = Window.orderBy("s")
    ranked = slopes.select(
        "s", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    med = ranked.filter(F.col("rn") == (F.col("m") + 1) / 2).select(
        F.col("m").alias("n_pairs"), F.round("s", 6).alias("median_slope")
    )
    return n_days.crossJoin(F.broadcast(med)).select(
        "n_days", "n_pairs", "median_slope"
    )


@query(
    "log_odds_monroe_terms",
    "analytics/text",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), ywl AS (
        SELECT lang, term, CAST(count(*) AS BIGINT) AS y
        FROM toks GROUP BY lang, term
    ), tot AS (
        SELECT lang, term, y,
               sum(y) OVER (PARTITION BY term) AS yw,
               sum(y) OVER (PARTITION BY lang) AS nl,
               sum(y) OVER () AS nn,
               (SELECT count(DISTINCT term) FROM toks) AS v
        FROM ywl
    ), z AS (
        SELECT lang, term, y,
               (ln(CAST(y + 1 AS DOUBLE)
                   / (nl + v - y - 1))
                - ln(CAST(yw - y + 1 AS DOUBLE)
                     / (nn - nl + v - (yw - y) - 1)))
               / sqrt(1.0 / (y + 1) + 1.0 / (yw - y + 1)) AS zscore
        FROM tot
    ), ranked AS (
        SELECT lang, term, y, zscore,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY zscore DESC, term) AS rnk
        FROM z
    )
    SELECT lang, term, y, round(zscore, 6) AS z, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def log_odds_monroe_terms(spark, sf_dir):
    """'Fightin' words' (Monroe/Colaresi/Quinn): per language, the top
    3 terms by variance-normalized log-odds ratio against the REST of
    the corpus, with a +1 Dirichlet prior — the statistically sound
    version of tf-idf term charts, and the standard way to audit what
    actually distinguishes one corpus slice from another before
    training on it.  All marginals are windows over the (lang x term)
    COUNT frame; the fact table is tokenized exactly once.  The
    z-score is deterministic double math off integer counts, rounded
    to 6; ties break on the term string."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("term"))
    ywl = toks.groupBy("lang", "term").agg(F.count("*").alias("y"))
    vocab = toks.select(F.countDistinct("term").alias("v"))
    t = ywl.select(
        "lang", "term", "y",
        F.sum("y").over(Window.partitionBy("term")).alias("yw"),
        F.sum("y").over(Window.partitionBy("lang")).alias("nl"),
        F.sum("y").over(Window.partitionBy()).alias("nn"),
    ).crossJoin(F.broadcast(vocab))
    num = (
        F.log((F.col("y") + 1).cast("double")
              / (F.col("nl") + F.col("v") - F.col("y") - 1))
        - F.log((F.col("yw") - F.col("y") + 1).cast("double")
                / (F.col("nn") - F.col("nl") + F.col("v")
                   - (F.col("yw") - F.col("y")) - 1))
    )
    var = 1.0 / (F.col("y") + 1) + 1.0 / (F.col("yw") - F.col("y") + 1)
    z = t.select("lang", "term", "y", (num / F.sqrt(var)).alias("zscore"))
    w = Window.partitionBy("lang").orderBy(F.col("zscore").desc(), "term")
    return (
        z.select("lang", "term", "y", "zscore",
                 F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("lang", "term", "y", F.round("zscore", 6).alias("z"),
                F.col("rnk").cast("int").alias("rnk"))
    )


@query(
    "wow_user_jaccard",
    "analytics/retention",
    oracle="""
    WITH wk AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS w,
               user_id
        FROM events
    ), sizes AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n FROM wk GROUP BY w
    ), inter AS (
        SELECT b.w AS w, CAST(count(*) AS BIGINT) AS i
        FROM wk a JOIN wk b
          ON a.user_id = b.user_id AND b.w = a.w + INTERVAL 7 DAY
        GROUP BY b.w
    )
    SELECT cur.w AS week_start, prev.n AS prev_users, cur.n AS cur_users,
           COALESCE(i.i, 0) AS common_users,
           round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (prev.n + cur.n - COALESCE(i.i, 0)), 6) AS jaccard
    FROM sizes cur
    JOIN sizes prev ON cur.w = prev.w + INTERVAL 7 DAY
    LEFT JOIN inter i ON i.w = cur.w
    """,
)
def wow_user_jaccard(spark, sf_dir):
    """Week-over-week audience overlap: the Jaccard similarity of each
    ISO week's distinct-user set against the previous week's — the
    set-valued stability metric behind churn dashboards (cohort
    retention measures who RETURNS; this measures how much the whole
    audience SHIFTED).  The user-set intersection is an equi-join on
    (user, week+7d) over the deduped (week, user) frame — shuffle
    volume is |weekly active users|, never raw events — and the
    weekly sizes frame is |weeks|-tier."""
    e = table(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", "ts").cast("date").alias("w"), "user_id"
    ).distinct()
    sizes = wk.groupBy("w").agg(F.count("*").alias("n"))
    a, b = wk.alias("a"), wk.alias("b")
    inter = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("b.w") == F.date_add(F.col("a.w"), 7)))
        .groupBy(F.col("b.w").alias("w"))
        .agg(F.count("*").alias("i"))
    )
    cur, prev = sizes.alias("cur"), sizes.alias("prev")
    joined = (
        cur.join(prev, F.col("cur.w") == F.date_add(F.col("prev.w"), 7))
        .join(inter.alias("i"), F.col("i.w") == F.col("cur.w"), "left")
    )
    i0 = F.coalesce(F.col("i.i"), F.lit(0))
    return joined.select(
        F.col("cur.w").alias("week_start"),
        F.col("prev.n").alias("prev_users"),
        F.col("cur.n").alias("cur_users"),
        i0.alias("common_users"),
        F.round(i0.cast("double")
                / (F.col("prev.n") + F.col("cur.n") - i0), 6)
        .alias("jaccard"),
    )


@query(
    "drawdown_from_peak_daily",
    "analytics/window",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS pri,
               CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE year(o_orderdate) = 1996
        GROUP BY 1, 2
    ), dd AS (
        SELECT pri, d, cents,
               max(cents) OVER (PARTITION BY pri ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cents AS drop
        FROM daily
    ), ranked AS (
        SELECT pri, d, drop,
               row_number() OVER (PARTITION BY pri
                                  ORDER BY drop DESC, d) AS rn
        FROM dd
    )
    SELECT pri, CAST(drop AS BIGINT) AS max_drawdown_cents,
           d AS worst_day
    FROM ranked WHERE rn = 1
    """,
)
def drawdown_from_peak_daily(spark, sf_dir):
    """Largest drop from the running peak of daily revenue, per order
    priority — the 'max drawdown' statistic (finance) applied to a
    rate series: how far below its best day each segment ever fell,
    and when.  One running-max window partitioned by priority (never
    global), then a deterministic argmax pick (earliest worst day on
    ties).  Exact integer cents end to end."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_orderpriority").alias("pri"),
                 F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("cents"))
    )
    wrun = (Window.partitionBy("pri").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dd = daily.select(
        "pri", "d", "cents",
        (F.max("cents").over(wrun) - F.col("cents")).alias("drop"),
    )
    wr = Window.partitionBy("pri").orderBy(F.col("drop").desc(), "d")
    return (
        dd.select("pri", "d", "drop", F.row_number().over(wr).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("pri", F.col("drop").cast("bigint").alias("max_drawdown_cents"),
                F.col("d").alias("worst_day"))
    )


@query(
    "poisson_rate_ci_by_type",
    "analytics/stats",
    oracle="""
    WITH span AS (
        SELECT CAST(datediff('day', min(CAST(ts AS DATE)),
                             max(CAST(ts AS DATE))) + 1 AS BIGINT)
               AS days
        FROM events
    ), cnt AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, days,
           round(CAST(n AS DOUBLE) / days, 6) AS rate_per_day,
           round(CAST(n AS DOUBLE) / days
                 - 1.96 * sqrt(CAST(n AS DOUBLE)) / days, 6) AS ci_low,
           round(CAST(n AS DOUBLE) / days
                 + 1.96 * sqrt(CAST(n AS DOUBLE)) / days, 6) AS ci_high
    FROM cnt, span
    """,
)
def poisson_rate_ci_by_type(spark, sf_dir):
    """Per-event-type arrival rate with a 95 % Poisson interval
    (normal approximation: rate ± 1.96·sqrt(n)/days) over the
    fixture's observed day span — the uncertainty-aware version of a
    plain count/day dashboard tile.  One fact-table aggregate plus a
    1-row span scalar broadcast; deterministic double math off
    integer counts, rounded to 6."""
    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    span = e.agg(
        (F.datediff(F.max(day), F.min(day)) + 1).cast("bigint").alias("days")
    )
    cnt = e.groupBy("event_type").agg(F.count("*").alias("n"))
    nd = F.col("n").cast("double")
    return cnt.crossJoin(F.broadcast(span)).select(
        "event_type", "n", "days",
        F.round(nd / F.col("days"), 6).alias("rate_per_day"),
        F.round(nd / F.col("days")
                - 1.96 * F.sqrt(nd) / F.col("days"), 6).alias("ci_low"),
        F.round(nd / F.col("days")
                + 1.96 * F.sqrt(nd) / F.col("days"), 6).alias("ci_high"),
    )


@query(
    "bloom_semi_join_runtime_filter",
    "scale/join",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           TRUE AS filter_effective
    FROM orders o
    WHERE o.o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
    )
    GROUP BY o.o_orderstatus
    """,
)
def bloom_semi_join_runtime_filter(spark, sf_dir):
    """Explicit Bloom runtime filter ahead of a semi join
    (operators/bloom.py): rich customers' keys fold into a broadcast
    bitmap (10 bits/key, 7 hashes); the orders scan drops provable
    non-matches in whole-stage codegen BEFORE the join shuffle, then
    the exact semi join removes the ~1 % false positives — row-
    identical to the plain semi join by construction, which is what
    the hashed aggregate proves.  ``filter_effective`` grades the
    sketch: the bloom must pass every true match (no false negatives
    — the correctness half) while keeping false positives under 5 %
    of the non-matching probe rows (the efficiency half; theory says
    ~1 % at these parameters, measured 0.9 %).  At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    matches + 1 % — the InjectRuntimeFilter pattern as a testable
    operator."""
    from ..operators.bloom import bloom_build, bloom_semi_join, might_contain

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0)
    res, num_bits = bloom_semi_join(o, c, "o_custkey", "c_custkey")

    # grade the filter: FP kept / non-matches <= 5 %, zero FNs
    bloom = bloom_build(c.select("c_custkey").distinct(), "c_custkey",
                        num_bits)
    kept = (
        o.crossJoin(F.broadcast(bloom))
        .filter(might_contain("bloom", "o_custkey", num_bits))
        .agg(F.count("*").alias("kept"))
    )
    totals = o.agg(F.count("*").alias("total"))
    matches = res.agg(F.count("*").alias("matches"))
    eff = (
        kept.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(matches))
        .select(
            (
                (F.col("kept") >= F.col("matches"))  # no false negatives
                & ((F.col("kept") - F.col("matches"))
                   <= 0.05 * (F.col("total") - F.col("matches")))
            ).alias("filter_effective")
        )
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    return (
        res.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.sum(cents).alias("sum_cents"))
        .crossJoin(F.broadcast(eff))
    )


@query(
    "cohens_kappa_quality_raters",
    "analytics/stats",
    oracle="""
    WITH rated AS (
        SELECT (n_chars >= 200) AS a,
               (len(string_split(text, ' ')) >= 40) AS b
        FROM documents
    ), cells AS (
        SELECT CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS yy,
               CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS yn,
               CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS ny,
               CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS n
        FROM rated
    )
    SELECT yy, yn, ny, nn,
           round(((CAST(yy + nn AS DOUBLE) / n)
                  - (CAST(yy + yn AS DOUBLE) / n * (yy + ny) / n
                     + CAST(ny + nn AS DOUBLE) / n * (yn + nn) / n))
                 / (1.0 - (CAST(yy + yn AS DOUBLE) / n * (yy + ny) / n
                           + CAST(ny + nn AS DOUBLE) / n
                             * (yn + nn) / n)), 6) AS kappa
    FROM cells
    """,
)
def cohens_kappa_quality_raters(spark, sf_dir):
    """Cohen's kappa between two document-quality 'raters' (a char
    gate and a token gate): chance-corrected agreement — the honest
    way to report whether two labeling heuristics actually agree
    beyond their base rates, which raw percent-agreement overstates
    badly on skewed corpora.  One conditional-aggregate pass builds
    the 2x2 table; kappa is deterministic double math off integer
    counts, rounded to 6."""
    d = table(spark, sf_dir, "documents")
    a = F.col("n_chars") >= 200
    b = F.size(F.split("text", " ")) >= 40
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0))
    cells = d.agg(
        cnt(a & b).alias("yy"), cnt(a & ~b).alias("yn"),
        cnt(~a & b).alias("ny"), cnt(~a & ~b).alias("nn"),
        F.count("*").alias("n"),
    )
    n = F.col("n").cast("double")
    po = (F.col("yy") + F.col("nn")).cast("double") / n
    pe = ((F.col("yy") + F.col("yn")).cast("double") / n
          * (F.col("yy") + F.col("ny")) / n
          + (F.col("ny") + F.col("nn")).cast("double") / n
          * (F.col("yn") + F.col("nn")) / n)
    return cells.select(
        "yy", "yn", "ny", "nn",
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


@query(
    "two_proportion_z_segments",
    "analytics/stats",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS seg,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ), agg AS (
        SELECT CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN seg = 'BUILDING' THEN hit ELSE 0 END)
                    AS BIGINT) AS x1,
               CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN hit ELSE 0 END)
                    AS BIGINT) AS x2
        FROM j
    )
    SELECT n1, x1, n2, x2,
           round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z
    FROM agg
    """,
)
def two_proportion_z_segments(spark, sf_dir):
    """Two-proportion z-test: is the 'F'-status order rate different
    between BUILDING and AUTOMOBILE customers?  The pooled-variance z
    statistic every A/B readout starts from, computed in ONE
    conditional-aggregate pass over the broadcast-joined fact (no
    per-group collect, no second scan).  Deterministic double math
    off four integer counts, rounded to 6."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            .alias("hit"),
        )
    )
    agg = j.agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("hit"))
              .otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", 1).otherwise(0))
        .alias("n2"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", F.col("hit"))
              .otherwise(0)).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return agg.select(
        "n1", "x1", "n2", "x2", F.round((p1 - p2) / se, 6).alias("z"))


@query(
    "hhi_revenue_concentration_by_region",
    "analytics/stats",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    ), tot AS (
        SELECT region, n_name, cents,
               sum(cents) OVER (PARTITION BY region) AS rtot
        FROM rev
    )
    SELECT region,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(sum((CAST(cents AS DOUBLE) / rtot)
                     * (CAST(cents AS DOUBLE) / rtot)) * 10000, 6)
               AS hhi
    FROM tot GROUP BY region
    """,
)
def hhi_revenue_concentration_by_region(spark, sf_dir):
    """Herfindahl–Hirschman index of nation revenue shares within each
    region — the antitrust-style concentration measure (10000 = one
    nation takes everything, 10000/n = perfectly even), complementing
    the Gini query with the squared-share formulation regulators
    actually quote.  Shares come from a window over the aggregated
    (region x nation) frame; exact integer cents feed one double
    division per cell."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "n_name")
        .agg(F.sum(cents).alias("cents"))
    )
    share = (F.col("cents").cast("double")
             / F.sum("cents").over(Window.partitionBy("region")))
    return (
        rev.select("region", (share * share).alias("s2"))
        .groupBy("region")
        .agg(F.count("*").alias("n_nations"),
             F.round(F.sum("s2") * 10000, 6).alias("hhi"))
    )


@query(
    "gini_split_gain_stump",
    "analytics/stats",
    oracle="""
    WITH lab AS (
        SELECT (o_totalprice >= 150000.0) AS left_side,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos,
               CAST(sum(CASE WHEN left_side THEN 1 ELSE 0 END)
                    AS BIGINT) AS nl,
               CAST(sum(CASE WHEN left_side THEN y ELSE 0 END)
                    AS BIGINT) AS posl
        FROM lab
    )
    SELECT n, pos, nl, posl,
           round((1.0 - power(CAST(pos AS DOUBLE) / n, 2)
                      - power(1.0 - CAST(pos AS DOUBLE) / n, 2))
                 - (CAST(nl AS DOUBLE) / n)
                   * (1.0 - power(CAST(posl AS DOUBLE) / nl, 2)
                          - power(1.0 - CAST(posl AS DOUBLE) / nl, 2))
                 - (CAST(n - nl AS DOUBLE) / n)
                   * (1.0 - power(CAST(pos - posl AS DOUBLE) / (n - nl), 2)
                          - power(1.0 - CAST(pos - posl AS DOUBLE)
                                  / (n - nl), 2)), 6) AS gini_gain
    FROM agg
    """,
)
def gini_split_gain_stump(spark, sf_dir):
    """Gini-impurity split gain of a decision stump (price >= 150k
    predicting status 'F') — the quantity a tree trainer maximizes at
    every node, here as ONE conditional-aggregate pass (no per-split
    shuffle): parent impurity minus the size-weighted child
    impurities, from four integer counts.  The feature-engineering
    sanity check before training on a 100 TB fact table: is this
    split worth anything?"""
    o = table(spark, sf_dir, "orders")
    left = F.col("o_totalprice") >= 150000.0
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    agg = o.agg(
        F.count("*").alias("n"),
        F.sum(y).alias("pos"),
        F.sum(F.when(left, 1).otherwise(0)).alias("nl"),
        F.sum(F.when(left, y).otherwise(0)).alias("posl"),
    )
    nd = F.col("n").cast("double")

    def gini(p):
        return 1.0 - F.pow(p, 2) - F.pow(1.0 - p, 2)

    parent = gini(F.col("pos").cast("double") / nd)
    pl = F.col("posl").cast("double") / F.col("nl")
    pr = (F.col("pos") - F.col("posl")).cast("double") / (F.col("n") - F.col("nl"))
    gain = (parent
            - (F.col("nl").cast("double") / nd) * gini(pl)
            - ((F.col("n") - F.col("nl")).cast("double") / nd) * gini(pr))
    return agg.select("n", "pos", "nl", "posl",
                      F.round(gain, 6).alias("gini_gain"))


@query(
    "odds_ratio_urgent_high_value",
    "analytics/stats",
    oracle="""
    WITH lab AS (
        SELECT (o_orderpriority = '1-URGENT') AS urgent,
               (o_totalprice >= 150000.0) AS high
        FROM orders
    ), cells AS (
        SELECT CAST(sum(CASE WHEN urgent AND high THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN urgent AND NOT high THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT urgent AND high THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT urgent AND NOT high THEN 1 ELSE 0
                        END) AS BIGINT) AS d
        FROM lab
    )
    SELECT a, b, c, d,
           round((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
                 / ((CAST(b AS DOUBLE) + 0.5)
                    * (CAST(c AS DOUBLE) + 0.5)), 6) AS odds_ratio,
           round(ln((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
                    / ((CAST(b AS DOUBLE) + 0.5)
                       * (CAST(c AS DOUBLE) + 0.5))), 6) AS log_or
    FROM cells
    """,
)
def odds_ratio_urgent_high_value(spark, sf_dir):
    """2x2 odds ratio with the Haldane–Anscombe +0.5 correction: how
    much more likely is a high-value order given 1-URGENT priority?
    The epidemiology-standard effect size for two binary variables,
    zero-cell-safe, from one conditional-aggregate pass.  Counts are
    exact integers; the ratio and its log round to 6."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    high = F.col("o_totalprice") >= 150000.0
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0))
    cells = o.agg(
        cnt(urgent & high).alias("a"), cnt(urgent & ~high).alias("b"),
        cnt(~urgent & high).alias("c"), cnt(~urgent & ~high).alias("d"),
    )
    orr = ((F.col("a").cast("double") + 0.5)
           * (F.col("d").cast("double") + 0.5)
           / ((F.col("b").cast("double") + 0.5)
              * (F.col("c").cast("double") + 0.5)))
    return cells.select(
        "a", "b", "c", "d",
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.log(orr), 6).alias("log_or"),
    )
