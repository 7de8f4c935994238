"""Round-14 analytics wave: rank-agreement statistics (Spearman
footrule, Kendall's W), information-theoretic corpus drift
(Jensen-Shannon divergence), the Ljung-Box portmanteau test over the
round-13 ACF machinery, and extreme-value analysis (method-of-moments
Gumbel fit on weekly block maxima).

Shared seams (SURVEY §7.3): money rides integer cents; sums and
cross-products of cents ride DECIMAL(38,0); ranks come from
row_number with a full deterministic ORDER BY (metric, then key) so
ties break identically on both engines; week buckets derive from
epoch-day // 7 (never week-of-year, which disagrees across engines);
each statistic is ONE double expression over exact integers,
token-identical in the oracle, rounded to 4-6 decimals; group-size
guards keep the empty-input twin at zero rows on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


def _cents(col):
    return F.floor(F.col(col) * 100).cast("bigint")


@query(
    "footrule_nation_rank_distance",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT n.n_name,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), ranked AS (
        SELECT n_name,
               CAST(row_number() OVER (ORDER BY rev_cents DESC, n_name)
                    AS BIGINT) AS rank_rev,
               CAST(row_number() OVER (ORDER BY n_orders DESC, n_name)
                    AS BIGINT) AS rank_cnt
        FROM per
    )
    SELECT n_name, rank_rev, rank_cnt,
           CAST(abs(rank_rev - rank_cnt) AS BIGINT) AS footrule_term,
           CAST((SELECT sum(abs(rank_rev - rank_cnt)) FROM ranked)
                AS BIGINT) AS footrule_total
    FROM ranked
    """,
)
def footrule_nation_rank_distance(spark, sf_dir):
    """Spearman's FOOTRULE distance between two nation rankings — by
    total revenue vs by order count: Σ|r1(i) - r2(i)|, the L1
    rank-displacement metric (Diaconis & Graham's companion to the
    rho/tau family; the number a ranking-stability monitor alarms
    on).  Ranks are row_number over (metric DESC, name) so ties break
    identically on both engines; per-nation displacement terms hash
    alongside the global total.  Scale: one fact-table aggregate to
    25 nation rows, then window math on the dictionary tier."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_cents("o_totalprice")).alias("rev_cents"),
             F.count("*").alias("n_orders"))
    )
    ranked = per.select(
        "n_name",
        F.row_number().over(
            Window.orderBy(F.desc("rev_cents"), F.asc("n_name"))
        ).cast("bigint").alias("rank_rev"),
        F.row_number().over(
            Window.orderBy(F.desc("n_orders"), F.asc("n_name"))
        ).cast("bigint").alias("rank_cnt"),
    )
    term = F.abs(F.col("rank_rev") - F.col("rank_cnt"))
    total = ranked.agg(
        F.sum(F.abs(F.col("rank_rev") - F.col("rank_cnt")))
        .cast("bigint").alias("footrule_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "n_name", "rank_rev", "rank_cnt",
        term.cast("bigint").alias("footrule_term"),
        "footrule_total",
    )


@query(
    "kendall_w_nation_metrics",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT n.n_name,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), ranked AS (
        SELECT n_name,
               CAST(row_number() OVER (ORDER BY rev_cents DESC, n_name)
                    AS BIGINT)
               + CAST(row_number() OVER (ORDER BY n_orders DESC, n_name)
                      AS BIGINT)
               + CAST(row_number() OVER (ORDER BY n_cust DESC, n_name)
                      AS BIGINT) AS rank_sum
        FROM per
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rank_sum * rank_sum) AS BIGINT) AS s2,
               CAST(sum(rank_sum) AS BIGINT) AS s1
        FROM ranked
    )
    SELECT n AS n_subjects, CAST(3 AS INT) AS n_rankings,
           round(CAST(12 * (s2 - s1 * s1 / n) AS DOUBLE)
                 / (9.0 * (n * n * n - n)), 6) AS kendall_w
    FROM agg
    WHERE n >= 2
    """,
)
def kendall_w_nation_metrics(spark, sf_dir):
    """Kendall's coefficient of concordance W across m=3 judge
    rankings of the nations — by revenue, by order count, by distinct
    customers: W = 12·S / (m²(n³-n)) with S the variance of the
    per-nation rank sums around their mean m(n+1)/2.  All rank sums
    and S stay exact integers (S·n = 12(n·Σ R² - (Σ R)²) algebra —
    here the mean term folds in as s1²/n, exact because s1 = n·m(n+1)/2
    is divisible by n); W is one double division rounded to 6 dp.
    W→1 means the three business metrics agree on the nation
    ordering; W→0 means they rank independently — the multi-metric
    version of the footrule row."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_cents("o_totalprice")).alias("rev_cents"),
             F.count("*").alias("n_orders"),
             F.countDistinct("o_custkey").alias("n_cust"))
    )
    ranked = per.select(
        (F.row_number().over(
            Window.orderBy(F.desc("rev_cents"), F.asc("n_name")))
         .cast("bigint")
         + F.row_number().over(
             Window.orderBy(F.desc("n_orders"), F.asc("n_name")))
         .cast("bigint")
         + F.row_number().over(
             Window.orderBy(F.desc("n_cust"), F.asc("n_name")))
         .cast("bigint")).alias("rank_sum")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("rank_sum") * F.col("rank_sum")).alias("s2"),
        F.sum("rank_sum").alias("s1"),
    )
    return agg.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_subjects"),
        F.lit(3).cast("int").alias("n_rankings"),
        F.expr("round(CAST(12 * (s2 - s1 * s1 / n) AS DOUBLE) "
               "/ (9.0 * (n * n * n - n)), 6)").alias("kendall_w"),
    )


@query(
    "jensen_shannon_source_drift",
    "analytics/text",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), pair AS (
        SELECT s1.s AS src_a, s2.s AS src_b
        FROM (SELECT DISTINCT source AS s FROM tok) s1
        JOIN (SELECT DISTINCT source AS s FROM tok) s2
          ON s1.s < s2.s
    ), cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, w
    ), tot AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt
        GROUP BY source
    ), vocab AS (
        SELECT p.src_a, p.src_b, x.w
        FROM pair p
        JOIN cnt x ON x.source IN (p.src_a, p.src_b)
        GROUP BY ALL
    ), terms AS (
        SELECT v.src_a, v.src_b, v.w,
               coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb,
               ta.t AS ta, tb.t AS tb
        FROM vocab v
        LEFT JOIN cnt a ON a.source = v.src_a AND a.w = v.w
        LEFT JOIN cnt b ON b.source = v.src_b AND b.w = v.w
        JOIN tot ta ON ta.source = v.src_a
        JOIN tot tb ON tb.source = v.src_b
    )
    SELECT src_a, src_b,
           round(sum(
             CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / ta)
                  * log2((CAST(ca AS DOUBLE) / ta)
                         / (0.5 * CAST(ca AS DOUBLE) / ta
                            + 0.5 * CAST(cb AS DOUBLE) / tb))
                  ELSE 0 END
             + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / tb)
                  * log2((CAST(cb AS DOUBLE) / tb)
                         / (0.5 * CAST(ca AS DOUBLE) / ta
                            + 0.5 * CAST(cb AS DOUBLE) / tb))
                  ELSE 0 END), 4) AS js_divergence_bits
    FROM terms
    GROUP BY src_a, src_b
    """,
)
def jensen_shannon_source_drift(spark, sf_dir):
    """Jensen-Shannon divergence (bits) between every PAIR of
    sources' unigram token distributions — the symmetric, bounded
    [0, 1] drift metric a corpus monitor tracks between crawls (KL's
    infinities on exclusive vocabulary are exactly what JS's mixture
    midpoint fixes, so the union-vocab full-outer join needs no
    smoothing).  Per-term contributions are doubles (log2 of
    rationals), so the pair total rounds to 4 dp — the same
    tolerance class as the graded entropy row; counts and totals
    underneath are exact integers.  Scale: token counts are one
    shuffle on (source, word); the pair join is dictionary-tier
    (sources × vocab), never corpus-sized."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    # (source × vocab)-tier counts materialized once (round-17, guide
    # §1.2): totals, both pair sides and the union-vocab keys all
    # consume cnt — each re-ran the corpus explode + aggregate before
    cnt = tok.groupBy("source", "w").agg(F.count("*").alias("c")) \
        .localCheckpoint()
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    srcs = tot.select(F.col("source").alias("s"))
    pair = (
        srcs.alias("s1")
        .join(srcs.alias("s2"), F.col("s1.s") < F.col("s2.s"))
        .select(F.col("s1.s").alias("src_a"), F.col("s2.s").alias("src_b"))
    )
    a = cnt.select(F.col("source").alias("src_a"), "w",
                   F.col("c").alias("ca"))
    b = cnt.select(F.col("source").alias("src_b"), "w",
                   F.col("c").alias("cb"))
    # union vocab per pair: every (pair, word) seen on either side
    keys = (
        a.select("src_a", "w").join(F.broadcast(pair), "src_a")
        .select("src_a", "src_b", "w")
        .union(
            b.select("src_b", "w").join(F.broadcast(pair), "src_b")
            .select("src_a", "src_b", "w"))
        .distinct()
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("t").alias("ta"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("t").alias("tb"))
    terms = (
        keys.join(a, ["src_a", "w"], "left")
        .join(b, ["src_b", "w"], "left")
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .na.fill({"ca": 0, "cb": 0})
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    m = 0.5 * pa + 0.5 * pb
    contrib = (
        F.when(F.col("ca") > 0, 0.5 * pa * F.log2(pa / m)).otherwise(0.0)
        + F.when(F.col("cb") > 0, 0.5 * pb * F.log2(pb / m)).otherwise(0.0)
    )
    return terms.groupBy("src_a", "src_b").agg(
        F.round(F.sum(contrib), 4).alias("js_divergence_bits"))


@query(
    "ljung_box_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        FROM daily
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM idx
    ), lagk AS (
        SELECT l.lag AS lag,
               CAST(sum(CAST(a.cents AS DECIMAL(38,0))
                        * CAST(b.cents AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(a.cents AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(b.cents AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(count(*) AS BIGINT) AS np
        FROM (SELECT unnest(generate_series(1, 7)) AS lag) l
        JOIN idx a ON TRUE
        JOIN idx b ON b.i = a.i + l.lag
        GROUP BY l.lag
    )
    SELECT (SELECT n FROM tot) AS n_days,
           CAST(7 AS INT) AS max_lag,
           round((SELECT n FROM tot) * ((SELECT n FROM tot) + 2.0)
                 * sum(
                     pow((sxy - sx * sy / np)
                         / ((SELECT s2 FROM tot)
                            - (SELECT s1 FROM tot)
                              * (SELECT s1 FROM tot) / (SELECT n FROM tot))
                         * (SELECT n FROM tot) / np, 2)
                     / ((SELECT n FROM tot) - lag)), 4) AS q_stat
    FROM lagk
    WHERE (SELECT n FROM tot) >= 9 AND np >= 2
    HAVING count(*) > 0
    """,
)
def ljung_box_daily_revenue(spark, sf_dir):
    """The Ljung-Box portmanteau test over the daily-revenue series:
    Q = n(n+2) Σ_{k=1..7} ρ_k²/(n-k), aggregating the seven graded
    autocorrelations (``acf_lag_k_daily_revenue``'s exact
    DECIMAL(38,0) machinery, reused term-for-term) into the single
    is-this-white-noise statistic — under H0, Q ~ χ²(7).  Every ρ_k
    is the identical one-double expression as the ACF row; Q adds one
    more token-identical reduction rounded to 4 dp.  The n >= 9 guard
    keeps every (n - k) divisor positive and the empty twin at zero
    rows."""
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(_cents("o_totalprice")).alias("cents"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # the series totals ride the checkpoint as an observation
    # (round-17, guide §1.2): the old tot frame cost a separate
    # aggregate job + broadcast build, and the un-materialized idx was
    # re-derived (orders scan + window) by tot and BOTH lag-join sides
    obs = Observation()
    idx = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("cents")).cast("double").alias("s1"),
        F.sum(dec("cents") * dec("cents")).cast("double").alias("s2"),
    ).localCheckpoint()
    tot = obs.get
    n = int(tot["n"])
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = idx.alias("a")
    b = idx.alias("b")
    lagk = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("a.cents").cast("decimal(38,0)")
                  * F.col("b.cents").cast("decimal(38,0)"))
            .cast("double").alias("sxy"),
            F.sum(F.col("a.cents").cast("decimal(38,0)"))
            .cast("double").alias("sx"),
            F.sum(F.col("b.cents").cast("decimal(38,0)"))
            .cast("double").alias("sy"),
            F.count("*").alias("np"),
        )
    )
    if n < 9:
        # the old n >= 9 filter dropped every row; same zero-row
        # frame with the same schema, without running the lag join
        return (
            lagk.limit(0)
            .select(F.lit(n).cast("bigint").alias("n_days"),
                    F.lit(7).cast("int").alias("max_lag"),
                    F.lit(None).cast("double").alias("q_stat"))
        )
    # literals carry the observed totals: the arithmetic below is the
    # same IEEE op tree over the same doubles as the old broadcast-tot
    # columns, so q_stat is bit-identical
    nl, s1l, s2l = (F.lit(n).cast("bigint"),
                    F.lit(tot["s1"]), F.lit(tot["s2"]))
    return (
        lagk.filter(F.col("np") >= 2)
        .groupBy(nl.alias("n"))
        .agg(F.round(
            nl * (nl + F.lit(2.0))
            * F.sum(
                F.pow(
                    (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np"))
                    / (s2l - s1l * s1l / nl)
                    * nl / F.col("np"), F.lit(2))
                / (nl - F.col("lag"))), 4).alias("q_stat"))
        .select(F.col("n").alias("n_days"),
                F.lit(7).cast("int").alias("max_lag"), "q_stat")
    )


@query(
    "gumbel_weekly_max_fit",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS ed,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), weekly AS (
        SELECT ed // 7 AS wk, CAST(max(cents) AS BIGINT) AS mx
        FROM daily GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(mx AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(mx AS DECIMAL(38,0))
                        * CAST(mx AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM weekly
    )
    SELECT n AS n_weeks,
           round(sqrt((s2 - s1 * s1 / n) / (n - 1))
                 * sqrt(6.0) / pi(), 4) AS beta_cents,
           round(s1 / n - 0.5772156649015329
                 * (sqrt((s2 - s1 * s1 / n) / (n - 1))
                    * sqrt(6.0) / pi()), 4) AS mu_cents
    FROM agg
    WHERE n >= 3
    """,
)
def gumbel_weekly_max_fit(spark, sf_dir):
    """Extreme-value analysis via BLOCK MAXIMA: the weekly maxima of
    daily revenue are Gumbel-distributed under Fisher-Tippett (domain
    of attraction of light-tailed daily sums), and the
    method-of-moments fit is closed-form — scale β = s·√6/π, location
    μ = x̄ - γβ (Euler-Mascheroni γ) — which is what makes it
    oracle-able without an iterative MLE.  Weeks derive from
    epoch-day // 7 (never week-of-year, which disagrees across
    engines); the maxima's first two moments ride DECIMAL(38,0); β
    and μ are each one double expression rounded to 4 dp.  This is
    the capacity-planning number: P(next week's peak > x) =
    1 - exp(-exp(-(x-μ)/β))."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("ed")
    ).agg(F.sum(_cents("o_totalprice")).alias("cents"))
    weekly = daily.groupBy(
        F.floor(F.col("ed") / 7).alias("wk")
    ).agg(F.max("cents").alias("mx"))
    dec = F.col("mx").cast("decimal(38,0)")
    agg = weekly.agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    return agg.filter(F.col("n") >= 3).select(
        F.col("n").alias("n_weeks"),
        F.expr("round(sqrt((s2 - s1 * s1 / n) / (n - 1)) "
               "* sqrt(6.0) / pi(), 4)").alias("beta_cents"),
        F.expr("round(s1 / n - 0.5772156649015329 "
               "* (sqrt((s2 - s1 * s1 / n) / (n - 1)) "
               "* sqrt(6.0) / pi()), 4)").alias("mu_cents"),
    )


@query(
    "pmi_bigram_collocations",
    "analytics/text",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bi AS (
        SELECT t[u.i] AS w1, t[u.i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM bi GROUP BY w1, w2
    ), uni AS (
        SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM (
            SELECT w1 AS w, c FROM bc
            UNION ALL SELECT w2, c FROM bc
        ) GROUP BY w
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n FROM bc
    ), scored AS (
        SELECT b.w1, b.w2, b.c,
               round(log2(CAST(b.c AS DOUBLE) * (SELECT n FROM tot)
                          / (CAST(u1.cw AS DOUBLE) * u2.cw)), 4) AS pmi
        FROM bc b
        JOIN uni u1 ON u1.w = b.w1
        JOIN uni u2 ON u2.w = b.w2
        WHERE b.c >= 5
    )
    SELECT w1, w2, c, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT 50
    """,
)
def pmi_bigram_collocations(spark, sf_dir):
    """Top-50 bigram COLLOCATIONS by pointwise mutual information —
    PMI(w1,w2) = log2(c(w1,w2)·N / (c(w1)·c(w2))) with unigram mass
    measured over bigram-slot participation (left + right), the
    Church & Hanks association measure a phrase-mining pass ranks
    candidate multiword expressions with.  The c >= 5 support floor
    is the standard guard against PMI's rare-pair bias (a hapax pair
    otherwise maxes the score).  Counts are exact integers; PMI is
    one log2 of a rational, rounded to 4 dp; the top-50 ties break
    on the bigram itself.  Scale shape: one shuffle on the bigram
    key, one on the unigram key — dictionary-tier joins after the
    first aggregate, the same envelope as the TF-IDF family."""
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = d.select(t.alias("t")).filter(F.size("t") >= 2)
    bi = base.select(
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("w1"),
                F.element_at("t", i + 1).alias("w2")),
        )).alias("p")
    ).select("p.w1", "p.w2")
    # vocab²-tier bigram counts materialized once (round-17, guide
    # §1.2): the unigram mass (two branches), the total and the main
    # ranking all consume bc — each re-ran the corpus bigram explode
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c")) \
        .localCheckpoint()
    uni = (
        bc.select(F.col("w1").alias("w"), "c")
        .unionAll(bc.select(F.col("w2").alias("w"), "c"))
        .groupBy("w").agg(F.sum("c").alias("cw"))
    )
    tot = bc.agg(F.sum("c").alias("n"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    return (
        bc.filter(F.col("c") >= 5)
        .join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c",
            F.round(F.log2(F.col("c").cast("double") * F.col("n")
                           / (F.col("cw1").cast("double")
                              * F.col("cw2"))), 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


@query(
    "theil_u_event_type_by_segment",
    "analytics/stats",
    oracle="""
    WITH joint AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n FROM joint
    ), margx AS (
        SELECT seg, CAST(sum(c) AS BIGINT) AS cx FROM joint GROUP BY seg
    ), margy AS (
        SELECT pri, CAST(sum(c) AS BIGINT) AS cy FROM joint GROUP BY pri
    ), hy AS (
        SELECT sum(-(CAST(cy AS DOUBLE) / (SELECT n FROM tot))
                   * log2(CAST(cy AS DOUBLE) / (SELECT n FROM tot)))
               AS h FROM margy
    ), hyx AS (
        SELECT sum(-(CAST(j.c AS DOUBLE) / (SELECT n FROM tot))
                   * log2(CAST(j.c AS DOUBLE) / m.cx)) AS h
        FROM joint j JOIN margx m ON j.seg = m.seg
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM margx) AS n_segments,
           (SELECT CAST(count(*) AS BIGINT) FROM margy) AS n_priorities,
           round((SELECT h FROM hy), 4) AS h_priority_bits,
           round(((SELECT h FROM hy) - (SELECT h FROM hyx))
                 / (SELECT h FROM hy), 4) AS theil_u
    FROM tot
    WHERE n > 0 AND (SELECT h FROM hy) > 0
    """,
)
def theil_u_event_type_by_segment(spark, sf_dir):
    """Theil's uncertainty coefficient U(priority | segment) — the
    ASYMMETRIC categorical-association measure (what fraction of
    order-priority entropy does knowing the market segment remove):
    U = (H(Y) - H(Y|X)) / H(Y), the normalized mutual information
    that, unlike Cramér's V (graded round 13), distinguishes
    direction.  All cell/margin counts are exact integers; each
    entropy is a sum of p·log2 terms rounded only at the final
    statistic (4 dp, the entropy-family tolerance); the H(Y) > 0
    guard keeps the degenerate single-priority corpus (and the empty
    twin) at zero rows on both engines.  Scale: one fact-table
    aggregate to a segments x priorities contingency grid, then
    dictionary-tier math."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joint = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"),
                 F.col("o_orderpriority").alias("pri"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()  # contingency-grid-sized; reused 4x
    )
    n = joint.agg(F.sum("c").alias("n"))
    margx = joint.groupBy("seg").agg(F.sum("c").alias("cx"))
    margy = joint.groupBy("pri").agg(F.sum("c").alias("cy"))
    hy = (
        margy.crossJoin(F.broadcast(n))
        .agg(F.sum(-(F.col("cy").cast("double") / F.col("n"))
                   * F.log2(F.col("cy").cast("double") / F.col("n")))
             .alias("h"))
    )
    hyx = (
        joint.join(margx, "seg")
        .crossJoin(F.broadcast(n))
        .agg(F.sum(-(F.col("c").cast("double") / F.col("n"))
                   * F.log2(F.col("c").cast("double") / F.col("cx")))
             .alias("h"))
    )
    nx = margx.agg(F.count("*").alias("n_segments"))
    ny = margy.agg(F.count("*").alias("n_priorities"))
    return (
        n.filter(F.col("n") > 0)
        .crossJoin(F.broadcast(nx)).crossJoin(F.broadcast(ny))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("hy"))))
        .crossJoin(F.broadcast(hyx.select(F.col("h").alias("hyx"))))
        .filter(F.col("hy") > 0)
        .select(
            "n_segments", "n_priorities",
            F.round(F.col("hy"), 4).alias("h_priority_bits"),
            F.round((F.col("hy") - F.col("hyx")) / F.col("hy"), 4)
            .alias("theil_u"),
        )
    )


@query(
    "kruskal_wallis_priority_value",
    "analytics/stats",
    oracle="""
    WITH x AS (
        SELECT o_orderpriority AS g,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ), ranked AS (
        SELECT g,
               2 * rank() OVER (ORDER BY v)
               + CAST(count(*) OVER (PARTITION BY v) AS BIGINT) - 1
               AS r2
        FROM x
    ), grp AS (
        SELECT g, CAST(count(*) AS BIGINT) AS nj,
               CAST(sum(CAST(r2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        FROM ranked GROUP BY g
    ), ties AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(38,0))
                        * CAST(t AS DECIMAL(38,0)) * t - t)
                    AS DOUBLE) AS tsum
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM x GROUP BY v)
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(nj) AS BIGINT) AS n,
               CAST(sum(CAST(s2 * s2 AS DECIMAL(38,6)) / (4 * nj))
                    AS DOUBLE) AS srr
        FROM grp
    )
    SELECT k AS n_groups, n AS n_total,
           round((12.0 * srr / (CAST(n AS DOUBLE) * (n + 1))
                  - 3.0 * (n + 1))
                 / (1.0 - (SELECT tsum FROM ties)
                        / (CAST(n AS DOUBLE) * n * n - n)), 4)
               AS h_stat
    FROM agg
    WHERE k >= 2 AND n >= 3
      AND (SELECT tsum FROM ties)
          < CAST(n AS DOUBLE) * n * n - n
    """,
)
def kruskal_wallis_priority_value(spark, sf_dir):
    """Kruskal-Wallis H across the five order priorities on order
    value — the rank-based one-way ANOVA completing the graded
    family (Mann-Whitney handles 2 groups, round 13's ANOVA is the
    parametric twin): H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1), divided
    by the tie correction 1 − Σ(t³−t)/(N³−N).  Midranks with ties
    stay EXACT by the doubling trick (2·midrank = 2·rank + tiesize −
    1, an integer; the .5 halves fold out as /4 in R_j²/n_j), rank
    sums and the tie cubic ride DECIMAL(38,0), and H is one double
    expression rounded to 4 dp.  Guards: >= 2 groups, N >= 3, and a
    non-degenerate tie correction (all-identical values would zero
    the denominator).  Scale: one global rank (the two-pass ranged
    rank at 100 TB, SCALE.md 'exact order statistics'), then
    dictionary-tier group math."""
    o = table(spark, sf_dir, "orders")
    x = o.select(F.col("o_orderpriority").alias("g"),
                 _cents("o_totalprice").alias("v"))
    r2 = (
        2 * F.rank().over(Window.orderBy("v"))
        + F.count("*").over(Window.partitionBy("v")).cast("bigint") - 1
    )
    ranked = x.select("g", r2.alias("r2"))
    grp = ranked.groupBy("g").agg(
        F.count("*").alias("nj"),
        F.sum(F.col("r2").cast("decimal(38,0)")).alias("s2"),
    )
    ties = (
        x.groupBy("v").agg(F.count("*").alias("t"))
        .agg(F.sum(F.col("t").cast("decimal(38,0)")
                   * F.col("t").cast("decimal(38,0)") * F.col("t")
                   - F.col("t")).cast("double").alias("tsum"))
    )
    agg = grp.agg(
        F.count("*").alias("k"),
        F.sum("nj").alias("n"),
        F.sum((F.col("s2") * F.col("s2")).cast("decimal(38,6)")
              / (4 * F.col("nj"))).cast("double").alias("srr"),
    )
    return (
        agg.crossJoin(F.broadcast(ties))
        .filter((F.col("k") >= 2) & (F.col("n") >= 3)
                & (F.col("tsum")
                   < F.col("n").cast("double") * F.col("n") * F.col("n")
                   - F.col("n")))
        .select(
            F.col("k").alias("n_groups"), F.col("n").alias("n_total"),
            F.expr("round((12.0 * srr / (CAST(n AS DOUBLE) * (n + 1)) "
                   "- 3.0 * (n + 1)) "
                   "/ (1.0 - tsum / (CAST(n AS DOUBLE) * n * n - n)), 4)"
                   ).alias("h_stat"),
        )
    )


@query(
    "page_hinkley_revenue_drift",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), cum AS (
        SELECT d,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
               CAST(sum(cents) OVER (ORDER BY d) AS BIGINT) AS s
        FROM daily
    ), m AS (
        SELECT d, t,
               s - CAST(sum(s // t) OVER (ORDER BY d) AS BIGINT) AS mt
        FROM cum
    ), dev AS (
        SELECT d, t,
               mt - min(mt) OVER (ORDER BY d) AS rise
        FROM m
    )
    SELECT (SELECT CAST(max(t) AS BIGINT) FROM dev) AS n_days,
           (SELECT CAST(max(rise) AS BIGINT) FROM dev) AS ph_max_cents,
           (SELECT min(d) FROM dev
            WHERE rise = (SELECT max(rise) FROM dev)) AS alarm_day
    FROM dev
    WHERE t = 1 AND (SELECT max(t) FROM dev) >= 3
    """,
)
def page_hinkley_revenue_drift(spark, sf_dir):
    """Page-Hinkley mean-shift detection over the daily-revenue
    series (the sequential drift test a data-quality monitor runs on
    a metric stream): m_t = Sum_{i<=t}(x_i - mean_i) with mean_i the
    RUNNING mean, and the alarm statistic is the largest rise of m_t
    above its running minimum - max_t (m_t - min_{i<=t} m_i), with
    the earliest day attaining it as the alarm point.  Unlike the
    graded CUSUM row (global-mean reference, decided once), PH is
    sequential: each deviation is measured against only the history
    seen so far, which is what makes it deployable on a live stream.

    Determinism is EXACT-INTEGER, not ordered-FP: the first attempt
    accumulated Sum S_i/i as doubles and diverged from DuckDB in the
    4th decimal at 2399 days (window aggregation is NOT bitwise
    order-stable across engines - a seam now on record), so the
    running mean is discretized to the FLOOR CENT (S_i div i,
    integer division on both engines, <= 1 cent per-term deviation by
    construction) and every quantity through the argmax is a BIGINT;
    the output is integer cents with no rounding anywhere.  Scale:
    day-dictionary-tier after one fact aggregate."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(_cents("o_totalprice")).alias("cents"))
    wd = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.sum("cents").over(wd).cast("bigint").alias("s"),
    )
    m = cum.select(
        "d", "t",
        (F.col("s") - F.sum(F.expr("s DIV t")).over(wd).cast("bigint"))
        .alias("mt"),
    )
    dev = m.select(
        "d", "t",
        (F.col("mt") - F.min("mt").over(wd)).alias("rise"),
    )
    agg = dev.agg(
        F.max("t").alias("n_days"),
        F.max("rise").cast("bigint").alias("ph_max_cents"),
    )
    alarm = (
        dev.crossJoin(F.broadcast(
            dev.agg(F.max("rise").alias("mx"))))
        .filter(F.col("rise") == F.col("mx"))
        .agg(F.min("d").alias("alarm_day"))
    )
    return (
        agg.crossJoin(F.broadcast(alarm))
        .filter(F.col("n_days") >= 3)
        .select("n_days", "ph_max_cents", "alarm_day")
    )


@query(
    "g_test_segment_priority",
    "analytics/stats",
    oracle="""
    WITH joint AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS obs
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), margx AS (
        SELECT seg, CAST(sum(obs) AS BIGINT) AS cx FROM joint GROUP BY seg
    ), margy AS (
        SELECT pri, CAST(sum(obs) AS BIGINT) AS cy FROM joint GROUP BY pri
    ), tot AS (
        SELECT CAST(sum(obs) AS BIGINT) AS n FROM joint
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM margx) AS n_segments,
           (SELECT CAST(count(*) AS BIGINT) FROM margy) AS n_priorities,
           CAST(((SELECT count(*) FROM margx) - 1)
                * ((SELECT count(*) FROM margy) - 1) AS BIGINT) AS dof,
           round(2 * sum(obs * ln(CAST(obs AS DOUBLE) * (SELECT n FROM tot)
                                  / (CAST(mx.cx AS DOUBLE) * my.cy))), 4)
               AS g_stat
    FROM joint j
    JOIN margx mx ON j.seg = mx.seg
    JOIN margy my ON j.pri = my.pri
    HAVING count(*) > 0 AND (SELECT n FROM tot) > 0
    """,
)
def g_test_segment_priority(spark, sf_dir):
    """The G-test of independence (log-likelihood ratio) on the
    market-segment x order-priority contingency grid: G = 2 Σ
    O·ln(O·N / (row·col)) — the information-theoretic counterpart of
    the graded chi-square row (G = 2N·ln2·MI, additive across
    partitions of the table, which is why log-linear modeling
    prefers it; both are χ²(dof) under H0).  Observed cells and
    margins are exact integers; zero cells contribute nothing
    (absent rows, the O·ln O → 0 limit); G is one rounded double
    over ~25 cells.  Scale: one fact-join aggregate to the
    dictionary-tier grid, then cell math."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joint = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"),
                 F.col("o_orderpriority").alias("pri"))
        .agg(F.count("*").alias("obs"))
        .localCheckpoint()  # grid-sized; feeds margins + cells
    )
    margx = joint.groupBy("seg").agg(F.sum("obs").alias("cx"))
    margy = joint.groupBy("pri").agg(F.sum("obs").alias("cy"))
    tot = joint.agg(F.sum("obs").alias("n"))
    nx = margx.agg(F.count("*").alias("n_segments"))
    ny = margy.agg(F.count("*").alias("n_priorities"))
    return (
        joint.join(margx, "seg").join(margy, "pri")
        .crossJoin(F.broadcast(tot))
        .agg(F.round(2 * F.sum(
            F.col("obs") * F.log(F.col("obs").cast("double") * F.col("n")
                                 / (F.col("cx").cast("double")
                                    * F.col("cy")))), 4).alias("g_stat"),
             F.count("*").alias("__cells"))
        .filter(F.col("__cells") > 0)
        .crossJoin(F.broadcast(nx)).crossJoin(F.broadcast(ny))
        .select(
            "n_segments", "n_priorities",
            ((F.col("n_segments") - 1) * (F.col("n_priorities") - 1))
            .cast("bigint").alias("dof"),
            "g_stat",
        )
    )


@query(
    "cochran_q_urgent_by_year",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(max(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS s
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997, 1998)
        GROUP BY 1, 2
    ), blocks AS (
        SELECT o_custkey FROM per GROUP BY 1 HAVING count(*) = 3
    ), x AS (
        SELECT p.o_custkey, p.y, p.s
        FROM per p JOIN blocks b ON p.o_custkey = b.o_custkey
    ), rowt AS (
        SELECT o_custkey, CAST(sum(s) AS BIGINT) AS r FROM x GROUP BY 1
    ), colt AS (
        SELECT y, CAST(sum(s) AS BIGINT) AS cj FROM x GROUP BY 1
    ), agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM blocks) AS b,
               (SELECT CAST(sum(cj) AS BIGINT) FROM colt) AS g,
               (SELECT CAST(sum(cj * cj) AS BIGINT) FROM colt) AS c2,
               (SELECT CAST(sum(r) AS BIGINT) FROM rowt) AS rs,
               (SELECT CAST(sum(r * r) AS BIGINT) FROM rowt) AS r2
    )
    SELECT b AS n_blocks, CAST(3 AS BIGINT) AS k_treatments,
           round(CAST(2 * (3 * c2 - g * g) AS DOUBLE)
                 / (3 * rs - r2), 4) AS q_stat
    FROM agg
    WHERE b >= 1 AND 3 * rs - r2 > 0
    """,
)
def cochran_q_urgent_by_year(spark, sf_dir):
    """Cochran's Q — the k-treatment repeated-measures test for
    BINARY outcomes (the McNemar generalization; round 13 graded the
    2-treatment case): did the propensity to place an URGENT order
    change across 1996/1997/1998 for the customers active in ALL
    three years (complete blocks, the design requirement)?
    Q = (k-1)·[k·ΣC_j² − G²] / (k·ΣR_i − ΣR_i²) ~ χ²(k-1) under
    H0(no year effect).  Every total is an exact integer (binary
    responses summed per block row / year column); Q is ONE double
    division rounded to 4 dp; guards keep the degenerate cases
    (zero complete blocks; all-equal row totals zeroing the
    denominator) and the empty twin at zero rows on both engines.
    Scale: one fact aggregate to (customer, year) bits, a HAVING
    gate for the blocks, then block/column totals — dictionary-tier
    after the first shuffle."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("bigint")
    per = (
        o.filter(yr.isin(1996, 1997, 1998))
        .groupBy(F.col("o_custkey"), yr.alias("y"))
        .agg(F.max(F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                   .otherwise(0)).cast("bigint").alias("s"))
    )
    blocks = per.groupBy("o_custkey").agg(
        F.count("*").alias("ny")).filter(F.col("ny") == 3) \
        .select("o_custkey")
    x = per.join(blocks, "o_custkey").localCheckpoint()
    rowt = x.groupBy("o_custkey").agg(F.sum("s").alias("r"))
    colt = x.groupBy("y").agg(F.sum("s").alias("cj"))
    agg = (
        blocks.agg(F.count("*").alias("b"))
        .crossJoin(F.broadcast(colt.agg(
            F.sum("cj").alias("g"),
            F.sum(F.col("cj") * F.col("cj")).alias("c2"))))
        .crossJoin(F.broadcast(rowt.agg(
            F.sum("r").alias("rs"),
            F.sum(F.col("r") * F.col("r")).alias("r2"))))
    )
    return (
        agg.filter((F.col("b") >= 1)
                   & (3 * F.col("rs") - F.col("r2") > 0))
        .select(
            F.col("b").alias("n_blocks"),
            F.lit(3).cast("bigint").alias("k_treatments"),
            F.expr("round(CAST(2 * (3 * c2 - g * g) AS DOUBLE) "
                   "/ (3 * rs - r2), 4)").alias("q_stat"),
        )
    )


@query(
    "hurst_exponent_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT x, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        FROM daily
    ), sized AS (
        SELECT s.n, i.t, i.x, (i.t - 1) // s.n AS blk
        FROM (SELECT unnest([8, 16, 32, 64]) AS n) s
        JOIN idx i ON i.t <= ((SELECT max(t) FROM idx) // s.n) * s.n
    ), pre AS (
        SELECT n, blk, x,
               CAST(sum(x) OVER (PARTITION BY n, blk ORDER BY t)
                    AS BIGINT) AS p,
               CAST(row_number() OVER (PARTITION BY n, blk ORDER BY t)
                    AS BIGINT) AS j
        FROM sized
    ), bsum AS (
        SELECT a.n, a.blk, a.s1, b.s2
        FROM (SELECT n, blk, CAST(p AS DECIMAL(38,0)) AS s1
              FROM pre WHERE j = n) a
        JOIN (SELECT n, blk,
                     CAST(sum(CAST(x AS DECIMAL(38,0))
                              * CAST(x AS DECIMAL(38,0)))
                          AS DECIMAL(38,0)) AS s2
              FROM sized GROUP BY n, blk) b
          ON a.n = b.n AND a.blk = b.blk
    ), dev AS (
        SELECT p.n, p.blk,
               greatest(CAST(max(p.n * p.p - p.j * b.s1) AS DECIMAL(38,0)),
                        CAST(0 AS DECIMAL(38,0)))
               - least(CAST(min(p.n * p.p - p.j * b.s1) AS DECIMAL(38,0)),
                       CAST(0 AS DECIMAL(38,0))) AS rn,
               p.n * b.s2 - b.s1 * b.s1 AS rad
        FROM pre p JOIN bsum b ON p.n = b.n AND p.blk = b.blk
        GROUP BY p.n, p.blk, b.s1, b.s2
    ), pts AS (
        SELECT n,
               log2(CAST(n AS DOUBLE)) AS lx,
               avg(log2(CAST(rn AS DOUBLE))
                   - 0.5 * log2(CAST(rad AS DOUBLE))) AS ly
        FROM dev
        WHERE rn > 0 AND rad > 0
        GROUP BY n
        HAVING count(*) >= 2
    )
    SELECT (SELECT CAST(max(t) AS BIGINT) FROM idx) AS n_days,
           CAST(count(*) AS BIGINT) AS n_sizes,
           round((sum(lx * ly) - sum(lx) * sum(ly) / count(*))
                 / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)), 4)
               AS hurst
    FROM pts
    HAVING count(*) >= 2
    """,
)
def hurst_exponent_daily_revenue(spark, sf_dir):
    """Hurst exponent of the daily-revenue series by RESCALED-RANGE
    analysis (Hurst/Mandelbrot long-memory diagnostic: H ≈ 0.5 for a
    memoryless series, > 0.5 persistent, < 0.5 mean-reverting): the
    series splits into complete blocks of n ∈ {8, 16, 32, 64} days;
    per block, the range R of cumulative mean-deviations (0-anchored)
    over the stddev S; H is the OLS slope of mean log2(R/S) on
    log2 n.  The FP-seam discipline: R·n = max_j(n·P_j − j·S1) −
    min_j(...) and the stddev radicand n·Σx² − S1² are EXACT
    DECIMAL(38,0) integers per block (the mean's denominator cleared
    by n, the CUSUM trick), so the only doubles are per-block log2s,
    block means, and the final 4-dp-rounded slope; degenerate
    (constant) blocks drop by the same rn > 0 AND rad > 0 filter on
    both engines, and sizes need >= 2 surviving blocks.  Scale: the
    series is day-dictionary-tier; the 4 sizes fan out as a
    broadcast grid — the whole analysis runs on |days| x 4 rows."""
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(_cents("o_totalprice")).alias("x"))
    # the series length rides the (already materializing) checkpoint
    # as an observation (round-17, guide §1.2) — the old nmax frame
    # cost one aggregate job plus two broadcast builds for one integer
    obs = Observation()
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("d")).cast("bigint")
        .alias("t")).observe(obs, F.max("t").alias("mx")) \
        .localCheckpoint()
    mx = obs.get["mx"]  # None on an empty series, exactly like max()
    mxl = F.lit(mx).cast("bigint")
    sizes = spark.createDataFrame([(8,), (16,), (32,), (64,)], "n bigint")
    sized = (
        F.broadcast(sizes)
        .join(idx, F.col("t")
              <= (mxl / F.col("n")).cast("bigint") * F.col("n"))
        .select("n", "t", "x",
                ((F.col("t") - 1) / F.col("n")).cast("bigint").alias("blk"))
    )
    wb = Window.partitionBy("n", "blk").orderBy("t")
    pre = sized.select(
        "n", "blk", "x",
        F.sum("x").over(wb).cast("bigint").alias("p"),
        F.row_number().over(wb).cast("bigint").alias("j"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    bsum = (
        pre.filter(F.col("j") == F.col("n"))
        .select("n", "blk", dec("p").alias("s1"))
        .join(
            sized.groupBy("n", "blk")
            .agg(F.sum(dec("x") * dec("x")).alias("s2")),
            ["n", "blk"])
    )
    nd = pre.join(bsum, ["n", "blk"]).select(
        "n", "blk", "s1", "s2",
        (dec("p") * F.col("n") - dec("j") * F.col("s1")).alias("ndj"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    dev = nd.groupBy("n", "blk", "s1", "s2").agg(
        (F.greatest(F.max("ndj"), zero)
         - F.least(F.min("ndj"), zero)).alias("rn"),
    ).select(
        "n", "blk", "rn",
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        .alias("rad"),
    )
    pts = (
        dev.filter((F.col("rn") > 0) & (F.col("rad") > 0))
        .groupBy("n")
        .agg(F.avg(F.log2(F.col("rn").cast("double"))
                   - 0.5 * F.log2(F.col("rad").cast("double")))
             .alias("ly"),
             F.count("*").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select(F.log2(F.col("n").cast("double")).alias("lx"), "ly")
    )
    return (
        pts.agg(
            F.count("*").alias("k"),
            F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
            F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
            F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        )
        .filter(F.col("k") >= 2)
        .select(
            mxl.alias("n_days"),
            F.col("k").alias("n_sizes"),
            F.expr("round((sxy - sx * sy / k) / (sxx - sx * sx / k), 4)")
            .alias("hurst"),
        )
    )


@query(
    "jonckheere_terpstra_priority_trend",
    "analytics/stats",
    oracle="""
    WITH x AS (
        SELECT o_orderpriority AS g,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ), cnt AS (
        SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY g, v
    ), grid AS (
        SELECT gg.g, vv.v, coalesce(c.c, 0) AS c
        FROM (SELECT DISTINCT g FROM cnt) gg
        CROSS JOIN (SELECT DISTINCT v FROM cnt) vv
        LEFT JOIN cnt c ON c.g = gg.g AND c.v = vv.v
    ), pre AS (
        SELECT g, v, c,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS BIGINT) AS below
        FROM grid
    ), pairs AS (
        SELECT a.g AS g1, b.g AS g2
        FROM (SELECT DISTINCT g FROM cnt) a
        JOIN (SELECT DISTINCT g FROM cnt) b ON a.g < b.g
    ), terms AS (
        SELECT p.g1, p.g2,
               CAST(sum(2 * q2.c * coalesce(q1.below, 0)
                        + q1.c * q2.c) AS BIGINT) AS u2
        FROM pairs p
        JOIN pre q1 ON q1.g = p.g1
        JOIN pre q2 ON q2.g = p.g2 AND q2.v = q1.v
        GROUP BY p.g1, p.g2
    ), gsz AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng FROM x GROUP BY g
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM gsz) AS n_groups,
           (SELECT CAST(sum(ng) AS BIGINT) FROM gsz) AS n_total,
           CAST((SELECT sum(a.ng * b.ng) FROM gsz a
                 JOIN gsz b ON a.g < b.g) AS BIGINT) AS n_pairs,
           CAST(sum(u2) AS DOUBLE) / 2 AS j_stat
    FROM terms
    HAVING count(*) > 0
    """,
)
def jonckheere_terpstra_priority_trend(spark, sf_dir):
    """Jonckheere-Terpstra ordered-alternative trend test: does order
    value trend MONOTONICALLY across the ordered priorities
    1-URGENT < ... < 5-LOW?  J = Σ_{g1<g2} U(g1,g2) with U the
    Mann-Whitney count (ties at 1/2) — more powerful than
    Kruskal-Wallis when the alternative is ordered, which is exactly
    the priority-ladder hypothesis.  The doubling trick keeps
    everything integral: 2U = Σ_v [2·c2(v)·C1(<v) + c1(v)·c2(v)]
    over the zero-filled (group x value) grid with per-group prefix
    counts, so J emerges as an exact .0/.5 double with NO rounding;
    n_pairs = Σ n1·n2 is the exact denominator a consumer normalizes
    by (J/n_pairs → 0.5 under H0).  Scale: the value dictionary is
    the only corpus-sized aggregate; the grid is |values| x 5 and
    the pair join is dictionary-tier."""
    # r16 optimization (guide §2.4 — remove shuffles outright): the
    # former shape materialized the zero-filled |groups| x |values|
    # grid (700 k rows at sf0.1), ran a |groups|-partition window over
    # it, and double-joined it against the broadcast pair list (1.4 M
    # join rows).  There are only |priorities| groups, so PIVOT the
    # per-(g, v) counts into one row per value (|values| x |groups|),
    # take the per-group prefix sums in ONE ordered window, and fold
    # all C(k,2) pair terms into a single aggregate as column
    # expressions.  Every term is exact integer arithmetic, so the
    # re-associated sum is value-identical (oracle PASS).  Group sizes
    # collect driver-side — bounded by the priority-domain cardinality
    # (same tier as the existing broadcast-scalar collects).
    o = table(spark, sf_dir, "orders")
    x = o.select(F.col("o_orderpriority").alias("g"),
                 _cents("o_totalprice").alias("v"))
    gsz = sorted(
        x.groupBy("g").agg(F.count("*").alias("ng")).collect(),
        key=lambda r: r["g"],
    )
    k = len(gsz)
    empty = spark.createDataFrame(
        [], "n_groups bigint, n_total bigint, n_pairs bigint, "
            "j_stat double")
    if k < 2:
        return empty
    glist = [r["g"] for r in gsz]
    sizes = [int(r["ng"]) for r in gsz]
    n_total = sum(sizes)
    n_pairs = sum(sizes[i] * sizes[j]
                  for i in range(k) for j in range(i + 1, k))
    cnt = x.groupBy("g", "v").agg(F.count("*").alias("c"))
    pv = cnt.groupBy("v").pivot("g", glist).sum("c").na.fill(0)
    cs = [F.col(f"`{g}`").alias(f"c{i}") for i, g in enumerate(glist)]
    pv = pv.select("v", *cs)
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, -1))
    below = [
        F.coalesce(F.sum(f"c{i}").over(w), F.lit(0)).cast("bigint")
        .alias(f"b{i}")
        for i in range(k)
    ]
    pre = pv.select("v", *[F.col(f"c{i}") for i in range(k)], *below)
    term = None
    for i in range(k):
        for j in range(i + 1, k):
            t = (2 * F.col(f"c{j}") * F.col(f"b{i}")
                 + F.col(f"c{i}") * F.col(f"c{j}"))
            term = t if term is None else term + t
    return (
        pre.agg(F.sum(term).alias("j2"))
        .select(
            F.lit(k).cast("bigint").alias("n_groups"),
            F.lit(n_total).cast("bigint").alias("n_total"),
            F.lit(n_pairs).cast("bigint").alias("n_pairs"),
            (F.col("j2").cast("double") / 2).alias("j_stat"),
        )
    )


@query(
    "yule_k_vocabulary_richness",
    "analytics/text",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), freq AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS f
        FROM tok GROUP BY lang, w
    ), agg AS (
        SELECT lang,
               CAST(sum(f) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS v,
               CAST(sum(f * f) AS BIGINT) AS m2
        FROM freq GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS vocab_size,
           round(10000.0 * (m2 - n) / (CAST(n AS DOUBLE) * n), 4)
               AS yule_k
    FROM agg
    WHERE n >= 2
    """,
)
def yule_k_vocabulary_richness(spark, sf_dir):
    """Yule's characteristic K per language — the classic
    length-invariant vocabulary-richness statistic (K = 10⁴·(Σf² −
    N)/N², derived from the word-frequency spectrum's second moment;
    higher K = more repetitive vocabulary), the stylometric number a
    corpus-quality dashboard tracks alongside the graded type-token
    and entropy rows.  N, V, and Σf² are exact integers from one
    (lang, word) aggregate; K is one rounded double.  Scale: the
    frequency table is the only corpus-sized shuffle; everything
    after is |langs| rows."""
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w").agg(F.count("*").alias("f"))
    )
    agg = freq.groupBy("lang").agg(
        F.sum("f").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("v"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("m2"),
    )
    return agg.filter(F.col("n") >= 2).select(
        "lang", F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab_size"),
        F.expr("round(10000.0 * (m2 - n) / (CAST(n AS DOUBLE) * n), 4)")
        .alias("yule_k"),
    )


@query(
    "palma_ratio_customer_revenue",
    "analytics/inequality",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ), nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM per
    ), ranked AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents DESC, o_custkey)
                    AS BIGINT) AS r
        FROM per
    )
    SELECT (SELECT n FROM nn) AS n_customers,
           CAST(sum(CASE WHEN r <= (SELECT n FROM nn) // 10
                         THEN cents ELSE 0 END) AS BIGINT) AS top10_cents,
           CAST(sum(CASE WHEN r > (SELECT n FROM nn)
                             - (2 * (SELECT n FROM nn)) // 5
                         THEN cents ELSE 0 END) AS BIGINT)
               AS bottom40_cents,
           round(CAST(sum(CASE WHEN r <= (SELECT n FROM nn) // 10
                               THEN cents ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN r > (SELECT n FROM nn)
                                - (2 * (SELECT n FROM nn)) // 5
                            THEN cents ELSE 0 END), 4) AS palma_ratio
    FROM ranked
    HAVING (SELECT n FROM nn) // 10 >= 1
       AND sum(CASE WHEN r > (SELECT n FROM nn)
                        - (2 * (SELECT n FROM nn)) // 5
                    THEN cents ELSE 0 END) > 0
    """,
)
def palma_ratio_customer_revenue(spark, sf_dir):
    """The Palma ratio of customer revenue concentration — top-10%
    share over bottom-40% share, the inequality measure that
    replaced Gini in development economics because it isolates the
    tails Gini's middle-weighting blurs (and the complement to the
    graded Gini/HHI rows).  Customers rank by exact revenue cents
    with the unique key as tie-break; the decile/quintile cut points
    are INTEGER counts (n//10, 2n//5 — no interpolation, the
    headcount convention), so both shares are exact integer cents
    and the ratio is one rounded division.  Guards require a
    non-empty top decile and positive bottom-40 mass.  Scale: one
    fact aggregate to |customers|, one global rank (two-pass ranged
    rank at 100 TB), then conditional sums."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("cents"))
    n = per.agg(F.count("*").alias("n"))
    ranked = (
        per.select(
            "cents",
            F.row_number().over(
                Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
            .cast("bigint").alias("r"))
        .crossJoin(F.broadcast(n))
    )
    top = F.sum(F.when(F.col("r") <= F.expr("n DIV 10"),
                       F.col("cents")).otherwise(0))
    bot = F.sum(F.when(F.col("r") > F.col("n") - F.expr("(2 * n) DIV 5"),
                       F.col("cents")).otherwise(0))
    return (
        ranked.groupBy("n")
        .agg(top.cast("bigint").alias("top10_cents"),
             bot.cast("bigint").alias("bottom40_cents"))
        .filter((F.expr("n DIV 10") >= 1)
                & (F.col("bottom40_cents") > 0))
        .select(
            F.col("n").alias("n_customers"), "top10_cents",
            "bottom40_cents",
            F.round(F.col("top10_cents").cast("double")
                    / F.col("bottom40_cents"), 4).alias("palma_ratio"),
        )
    )


@query(
    "fano_factor_daily_orders",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY o_orderdate
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM daily
    )
    SELECT n AS n_days, s1 AS n_orders,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                 / (n - 1) / (CAST(s1 AS DOUBLE) / n), 4) AS fano_factor
    FROM agg
    WHERE n >= 2 AND s1 > 0
    """,
)
def fano_factor_daily_orders(spark, sf_dir):
    """Fano factor (index of dispersion) of the daily order-arrival
    counts: sample variance over mean — the Poisson-ness diagnostic
    (F ≈ 1 for a memoryless arrival process, > 1 overdispersed /
    bursty, < 1 regularized), the first number a capacity model
    checks before assuming Poisson arrivals.  Count moments are
    exact integers; F is one double expression rounded to 4 dp with
    n >= 2 and positive-mass guards.  Scale: one fact aggregate to
    the day dictionary."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").alias("c"))
    agg = daily.agg(
        F.count("*").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    return agg.filter((F.col("n") >= 2) & (F.col("s1") > 0)).select(
        F.col("n").alias("n_days"), F.col("s1").alias("n_orders"),
        F.expr("round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) "
               "/ (n - 1) / (CAST(s1 AS DOUBLE) / n), 4)")
        .alias("fano_factor"),
    )


@query(
    "somers_d_priority_value_quartile",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS xo,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ), nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM per
    ), ranked AS (
        SELECT xo,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS r
        FROM per
    ), cells AS (
        SELECT xo,
               least(((r - 1) * 4) // (SELECT n FROM nn) + 1, 4) AS yo,
               CAST(count(*) AS BIGINT) AS c
        FROM ranked GROUP BY 1, 2
    ), pairs AS (
        SELECT CAST(sum(CASE WHEN b.xo > a.xo AND b.yo > a.yo
                             THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
               CAST(sum(CASE WHEN b.xo > a.xo AND b.yo < a.yo
                             THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc,
               CAST(sum(CASE WHEN b.xo > a.xo AND b.yo = a.yo
                             THEN a.c * b.c ELSE 0 END) AS BIGINT) AS ty
        FROM cells a JOIN cells b ON TRUE
    )
    SELECT (SELECT n FROM nn) AS n_orders, conc, disc,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc + ty), 4)
               AS somers_d
    FROM pairs
    WHERE conc + disc + ty > 0
    """,
)
def somers_d_priority_value_quartile(spark, sf_dir):
    """Somers' D of value quartile ON order priority — the ASYMMETRIC
    ordinal-association coefficient (Kendall's tau-family numerator
    normalized by pairs untied on the PREDICTOR): does moving down
    the priority ladder 1-URGENT → 5-LOW shift order value across
    its quartiles?  X = the priority's leading digit (the encoding
    makes the order explicit); Y = the value quartile by exact
    integer rank cut points (r·4/n headcount buckets, no
    interpolation, unique-key tie-break).  C, D, and the Y-ties are
    exact integer products over the 5x4 contingency cells (a
    dictionary-tier self-join of 20 rows); D_{Y|X} is one rounded
    division.  Scale: one global rank (two-pass ranged at 100 TB),
    one grid aggregate, then cell math."""
    o = table(spark, sf_dir, "orders")
    per = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("xo"),
        _cents("o_totalprice").alias("cents"), "o_orderkey")
    nn = per.agg(F.count("*").alias("n"))
    ranked = per.select(
        "xo",
        F.row_number().over(Window.orderBy("cents", "o_orderkey"))
        .cast("bigint").alias("r"))
    cells = (
        ranked.crossJoin(F.broadcast(nn))
        .select("xo",
                F.least(F.expr("((r - 1) * 4) DIV n") + 1,
                        F.lit(4).cast("bigint")).alias("yo"))
        .groupBy("xo", "yo").agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.join(b, F.lit(True)).agg(
        F.sum(F.when((F.col("b.xo") > F.col("a.xo"))
                     & (F.col("b.yo") > F.col("a.yo")),
                     F.col("a.c") * F.col("b.c")).otherwise(0))
        .cast("bigint").alias("conc"),
        F.sum(F.when((F.col("b.xo") > F.col("a.xo"))
                     & (F.col("b.yo") < F.col("a.yo")),
                     F.col("a.c") * F.col("b.c")).otherwise(0))
        .cast("bigint").alias("disc"),
        F.sum(F.when((F.col("b.xo") > F.col("a.xo"))
                     & (F.col("b.yo") == F.col("a.yo")),
                     F.col("a.c") * F.col("b.c")).otherwise(0))
        .cast("bigint").alias("ty"),
    )
    return (
        pairs.crossJoin(F.broadcast(nn))
        .filter(F.col("conc") + F.col("disc") + F.col("ty") > 0)
        .select(
            F.col("n").alias("n_orders"), "conc", "disc",
            F.round((F.col("conc") - F.col("disc")).cast("double")
                    / (F.col("conc") + F.col("disc") + F.col("ty")), 4)
            .alias("somers_d"),
        )
    )


@query(
    "jarque_bera_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(floor(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          / 100) AS BIGINT) AS x
        FROM orders GROUP BY o_orderdate
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(x AS DECIMAL(38,0))
                        * CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s2,
               CAST(sum(CAST(x AS DECIMAL(38,0))
                        * CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS s3,
               CAST(sum(CAST(x AS DECIMAL(38,0))
                        * CAST(x AS DECIMAL(38,0)) * x * x) AS DOUBLE) AS s4
        FROM daily
    )
    SELECT n AS n_days,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
                 / pow(s2 / n - pow(s1 / n, 2), 1.5), 4) AS skewness,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4))
                 / pow(s2 / n - pow(s1 / n, 2), 2) - 3, 4)
               AS excess_kurtosis,
           round(n / 6.0 * (
               pow((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
                   / pow(s2 / n - pow(s1 / n, 2), 1.5), 2)
               + pow((s4 / n - 4 * (s1 / n) * (s3 / n)
                      + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4))
                     / pow(s2 / n - pow(s1 / n, 2), 2) - 3, 2) / 4), 4)
               AS jb_stat
    FROM agg
    WHERE n >= 4 AND s2 / n - pow(s1 / n, 2) > 0
    """,
)
def jarque_bera_daily_revenue(spark, sf_dir):
    """Jarque-Bera normality test on the daily-revenue series —
    JB = n/6·(skew² + kurt²/4) ~ χ²(2) under normality, the
    moment-based test a forecasting pipeline runs before trusting
    Gaussian intervals.  The raw power sums S1..S4 are EXACT (daily
    revenue floored to whole dollars so S4 stays inside
    DECIMAL(38,0) — cents⁴ would overflow it); skewness and excess
    kurtosis come from the standard central-moment expansions as
    token-identical double expressions over those exact sums, each
    rounded to 4 dp alongside JB itself.  Scale: day-dictionary-tier
    after one fact aggregate."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.floor(F.sum(_cents("o_totalprice")) / 100).cast("bigint")
        .alias("x"))
    dec = F.col("x").cast("decimal(38,0)")
    agg = daily.agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
        F.sum(dec * dec * F.col("x")).cast("double").alias("s3"),
        F.sum(dec * dec * F.col("x") * F.col("x")).cast("double")
        .alias("s4"),
    )
    skew = ("(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3)) "
            "/ pow(s2 / n - pow(s1 / n, 2), 1.5)")
    kurt = ("(s4 / n - 4 * (s1 / n) * (s3 / n) "
            "+ 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4)) "
            "/ pow(s2 / n - pow(s1 / n, 2), 2) - 3")
    return (
        agg.filter((F.col("n") >= 4)
                   & (F.expr("s2 / n - pow(s1 / n, 2)") > 0))
        .select(
            F.col("n").alias("n_days"),
            F.expr(f"round({skew}, 4)").alias("skewness"),
            F.expr(f"round({kurt}, 4)").alias("excess_kurtosis"),
            F.expr(f"round(n / 6.0 * (pow({skew}, 2) "
                   f"+ pow({kurt}, 2) / 4), 4)").alias("jb_stat"),
        )
    )


@query(
    "markov_entropy_rate_events",
    "analytics/sequence",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts::TIMESTAMP, event_id) AS nxt
        FROM events
    ), trans AS (
        SELECT event_type AS a, nxt AS b, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), rowt AS (
        SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM trans GROUP BY a
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n FROM trans
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           CAST(count(DISTINCT t.a) AS BIGINT) AS n_states,
           round(sum(-(CAST(t.c AS DOUBLE) / (SELECT n FROM tot))
                     * log2(CAST(t.c AS DOUBLE) / r.ra)), 4)
               AS entropy_rate_bits
    FROM trans t JOIN rowt r ON t.a = r.a
    HAVING count(*) > 0
    """,
)
def markov_entropy_rate_events(spark, sf_dir):
    """Entropy RATE of the per-user event-type Markov chain —
    H = Σ_a π(a) · H(next | a) = −Σ_{a,b} (c_ab/N)·log2(c_ab/c_a·)
    with the stationary weights estimated by the empirical transition
    mass (the plug-in entropy rate; the memory-aware sibling of the
    graded unigram entropy and Markov-transition rows: H_rate <
    H_unigram measures how much the previous event predicts the
    next).  Transition and row counts are exact integers from ONE
    lead() pass; the rate is a sum of p·log2 terms rounded to 4 dp
    (the entropy-family tolerance).  Scale: one shuffle to order
    each user's events, then state-pair-dictionary math."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"))
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    rowt = trans.groupBy("a").agg(F.sum("c").alias("ra"))
    tot = trans.agg(F.sum("c").alias("n"))
    return (
        trans.join(rowt, "a")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(-(F.col("c").cast("double") / F.col("n"))
                          * F.log2(F.col("c").cast("double")
                                   / F.col("ra"))), 4)
            .alias("entropy_rate_bits"),
            F.countDistinct("a").cast("bigint").alias("n_states"),
            F.first("n").alias("n_transitions"),
            F.count("*").alias("__cells"),
        )
        .filter(F.col("__cells") > 0)
        .select("n_transitions", "n_states", "entropy_rate_bits")
    )


@query(
    "nelson_aalen_transit_hazard",
    "analytics/stats",
    oracle="""
    WITH obs AS (
        SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS t,
               CAST(l.l_returnflag <> 'R' AS INT) AS ev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), agg AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS m
        FROM obs GROUP BY t
    ), risk AS (
        SELECT t, d,
               CAST(sum(m) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n
        FROM agg
    ), ev AS (
        SELECT t, d, n FROM risk WHERE d > 0
    )
    SELECT t, d, n,
           round(sum(CAST(d AS DOUBLE) / n)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW), 6) AS cum_hazard,
           round(exp(-sum(CAST(d AS DOUBLE) / n)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)), 6) AS breslow_survival
    FROM ev
    """,
)
def nelson_aalen_transit_hazard(spark, sf_dir):
    """Nelson-Aalen cumulative hazard over order-to-ship lead times —
    the estimator survival analysis pairs with the graded
    Kaplan-Meier row (H(t) = Σ_{t'<=t} d/n over event times; KM
    multiplies the complements, NA sums the hazards; exp(-H) is the
    Breslow survival, which must sit slightly ABOVE the KM curve —
    the textbook cross-check a reviewer applies to both rows
    together).  d/n/at-risk counts are exact integers on the
    ~|distinct durations| dictionary; the cumulative hazard is a SUM
    of O(1)-magnitude exact-rational doubles (unlike the
    Page-Hinkley case, summation-order nondeterminism on ~100 terms
    of size <= 1 sits ~8 orders below the 6-dp round), and censoring
    (returnflag 'R') enters only through the at-risk denominators.
    Scale: fact table collapses to the duration dictionary in one
    partial agg; the triangular join runs on that dictionary."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    obs = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("t"),
        (F.col("l_returnflag") != "R").cast("int").alias("ev"),
    )
    agg = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count("*").alias("m"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0)
    ev = (
        agg.select("t", "d",
                   F.sum("m").over(w).cast("bigint").alias("n"))
        .filter(F.col("d") > 0)
    )
    # ascending cumulative window, not a triangular self-join: the
    # event dictionary is tiny but a theta join would plan a
    # CartesianProduct; both engines accumulate the O(1)-magnitude
    # hazard terms in ascending-t frame order, ~8 orders below the
    # 6-dp round
    wasc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0)
    h = F.col("d").cast("double") / F.col("n")
    return ev.select(
        "t", "d", "n",
        F.round(F.sum(h).over(wasc), 6).alias("cum_hazard"),
        F.round(F.exp(-F.sum(h).over(wasc)), 6).alias("breslow_survival"),
    )


@query(
    "theil_atkinson_revenue_inequality",
    "analytics/inequality",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s,
               sum(CAST(cents AS DOUBLE)
                   * ln(CAST(cents AS DOUBLE))) AS sxlx,
               sum(ln(CAST(cents AS DOUBLE))) AS slx
        FROM per WHERE cents > 0
    )
    SELECT n AS n_customers,
           round(sxlx / s - ln(s / n), 4) AS theil_t,
           round(1 - exp(slx / n) / (s / n), 4) AS atkinson_1
    FROM agg
    WHERE n >= 2 AND s > 0
    """,
)
def theil_atkinson_revenue_inequality(spark, sf_dir):
    """Theil's T and the Atkinson index (ε=1) of customer revenue —
    the two WELFARE-THEORETIC inequality measures completing the
    graded family (Gini weights the middle, HHI the squares, Palma
    the tails): T = Σ(x/X)·ln(x / (X/n)) folds to sxlx/X − ln(X/n)
    over two log-moment sums, and A₁ = 1 − geomean/mean needs only
    Σln x.  T is additively DECOMPOSABLE across subgroups (why
    economists reach for it over Gini) and A₁ has an explicit
    inequality-aversion interpretation.  Zero-revenue customers drop
    on both engines (ln 0; the standard convention); the revenue
    total rides DECIMAL(38,0); the log sums are O(1)-magnitude terms
    far below the 4-dp round.  Scale: one fact aggregate to
    |customers|, then three scalar reductions."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("cents"))
    agg = per.filter(F.col("cents") > 0).agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
        .alias("s"),
        F.sum(F.col("cents").cast("double")
              * F.log(F.col("cents").cast("double"))).alias("sxlx"),
        F.sum(F.log(F.col("cents").cast("double"))).alias("slx"),
    )
    return agg.filter((F.col("n") >= 2) & (F.col("s") > 0)).select(
        F.col("n").alias("n_customers"),
        F.expr("round(sxlx / s - ln(s / n), 4)").alias("theil_t"),
        F.expr("round(1 - exp(slx / n) / (s / n), 4)").alias("atkinson_1"),
    )


@query(
    "logrank_test_transit_by_linestatus",
    "analytics/stats",
    oracle="""
    WITH obs AS (
        SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS t,
               CAST(l.l_returnflag <> 'R' AS INT) AS ev,
               CAST(l.l_linestatus = 'O' AS INT) AS g1
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), agg AS (
        SELECT t,
               CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(ev * g1) AS BIGINT) AS d1,
               CAST(sum(g1) AS BIGINT) AS m1
        FROM obs GROUP BY t
    ), risk AS (
        SELECT t, d, d1,
               CAST(sum(m) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n,
               CAST(sum(m1) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n1
        FROM agg
    ), ev AS (
        SELECT * FROM risk WHERE d > 0 AND n > 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_event_times,
           CAST(sum(d1) AS BIGINT) AS observed_g1,
           round(sum(CAST(d AS DOUBLE) * n1 / n), 4) AS expected_g1,
           round(sum(CAST(d AS DOUBLE) * n1 / n * (n - n1) / n
                     * (n - d) / (n - 1)), 4) AS variance_g1,
           round(pow(sum(d1) - sum(CAST(d AS DOUBLE) * n1 / n), 2)
                 / sum(CAST(d AS DOUBLE) * n1 / n * (n - n1) / n
                       * (n - d) / (n - 1)), 4) AS logrank_chi2
    FROM ev
    HAVING count(*) > 0
       AND sum(CAST(d AS DOUBLE) * n1 / n * (n - n1) / n
               * (n - d) / (n - 1)) > 0
    """,
)
def logrank_test_transit_by_linestatus(spark, sf_dir):
    """The LOG-RANK test comparing transit-time survival between the
    'O' and 'F' linestatus strata — completing the survival trio
    (Kaplan-Meier curve, Nelson-Aalen hazard, and now the two-sample
    TEST a clinical/reliability analysis runs on them): at each event
    time the observed group-1 events compare against the
    hypergeometric expectation d·n₁/n, with χ²(1) =
    (O₁−E₁)²/V under H0.  d/n/d₁/n₁ are exact integers from the same
    reverse-cumulative at-risk machinery as the graded KM row
    (censoring via returnflag); E₁ and V are sums of
    exact-rational doubles over the ~|durations| dictionary, rounded
    at 4 dp (summation-order noise sits orders below).  Scale: one
    fact aggregate to the duration dictionary, two integer window
    sums, three scalar reductions."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    obs = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("t"),
        (F.col("l_returnflag") != "R").cast("int").alias("ev"),
        (F.col("l_linestatus") == "O").cast("int").alias("g1"),
    )
    agg = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count("*").alias("m"),
        F.sum(F.col("ev") * F.col("g1")).cast("bigint").alias("d1"),
        F.sum("g1").cast("bigint").alias("m1"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0)
    risk = agg.select(
        "t", "d", "d1",
        F.sum("m").over(w).cast("bigint").alias("n"),
        F.sum("m1").over(w).cast("bigint").alias("n1"),
    )
    ev = risk.filter((F.col("d") > 0) & (F.col("n") > 1))
    e_term = F.col("d").cast("double") * F.col("n1") / F.col("n")
    v_term = (F.col("d").cast("double") * F.col("n1") / F.col("n")
              * (F.col("n") - F.col("n1")) / F.col("n")
              * (F.col("n") - F.col("d")) / (F.col("n") - 1))
    return (
        ev.agg(
            F.count("*").alias("n_event_times"),
            F.sum("d1").cast("bigint").alias("observed_g1"),
            F.sum(e_term).alias("e1"),
            F.sum(v_term).alias("v1"),
        )
        .filter((F.col("n_event_times") > 0) & (F.col("v1") > 0))
        .select(
            "n_event_times", "observed_g1",
            F.round(F.col("e1"), 4).alias("expected_g1"),
            F.round(F.col("v1"), 4).alias("variance_g1"),
            F.round(F.pow(F.col("observed_g1") - F.col("e1"), 2)
                    / F.col("v1"), 4).alias("logrank_chi2"),
        )
    )


@query(
    "cliffs_delta_segment_value",
    "analytics/stats",
    oracle="""
    WITH x AS (
        SELECT c.c_mktsegment AS g,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'HOUSEHOLD')
    ), cnt AS (
        SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY g, v
    ), grid AS (
        SELECT vv.v,
               coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
        FROM (SELECT DISTINCT v FROM cnt) vv
        LEFT JOIN cnt a ON a.v = vv.v AND a.g = 'BUILDING'
        LEFT JOIN cnt b ON b.v = vv.v AND b.g = 'HOUSEHOLD'
    ), pre AS (
        SELECT v, ca, cb,
               CAST(coalesce(sum(cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS b_below
        FROM grid
    ), agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2,
               CAST(sum(ca * b_below) AS BIGINT) AS gt,
               CAST(sum(ca * cb) AS BIGINT) AS ties
        FROM pre
    )
    SELECT n1 AS n_building, n2 AS n_household,
           round(CAST(2 * gt + ties - n1 * n2 AS DOUBLE)
                 / (n1 * n2), 4) AS cliffs_delta
    FROM agg
    WHERE n1 > 0 AND n2 > 0
    """,
)
def cliffs_delta_segment_value(spark, sf_dir):
    """Cliff's delta between the BUILDING and HOUSEHOLD segments'
    order values — the nonparametric EFFECT SIZE (δ = P(X>Y) −
    P(X<Y) ∈ [−1, 1]) that pairs with the graded significance tests
    (Mann-Whitney says whether, δ says how much — the reporting
    standard when distributions are skewed and Cohen's d misleads).
    Exact integer identity: with GT = #{x>y} pairs and T = ties,
    P(X>Y) − P(X<Y) = (2·GT + T − n₁n₂)/(n₁n₂), computed from the
    value dictionary with a per-value below-prefix — no pair ever
    materializes.  One rounded division.  Scale: one fact aggregate
    to the value dictionary, one ordered prefix window."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "HOUSEHOLD"))
        .select(F.col("c_mktsegment").alias("g"),
                _cents("o_totalprice").alias("v"))
    )
    cnt = x.groupBy("g", "v").agg(F.count("*").alias("c"))
    vv = cnt.select("v").distinct()
    a = cnt.filter(F.col("g") == "BUILDING").select(
        "v", F.col("c").alias("ca"))
    b = cnt.filter(F.col("g") == "HOUSEHOLD").select(
        "v", F.col("c").alias("cb"))
    grid = (
        vv.join(a, "v", "left").join(b, "v", "left")
        .na.fill({"ca": 0, "cb": 0})
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pre = grid.select(
        "v", "ca", "cb",
        F.coalesce(F.sum("cb").over(wv), F.lit(0)).cast("bigint")
        .alias("b_below"),
    )
    agg = pre.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.sum(F.col("ca") * F.col("b_below")).cast("bigint").alias("gt"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("ties"),
    )
    return agg.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.col("n1").alias("n_building"), F.col("n2").alias("n_household"),
        F.expr("round(CAST(2 * gt + ties - n1 * n2 AS DOUBLE) "
               "/ (n1 * n2), 4)").alias("cliffs_delta"),
    )


@query(
    "wilcoxon_signed_rank_yearly_max",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(max(CASE WHEN year(o_orderdate) = 1996
                        THEN floor(o_totalprice * 100) END) AS BIGINT)
                   AS m1,
               CAST(max(CASE WHEN year(o_orderdate) = 1997
                        THEN floor(o_totalprice * 100) END) AS BIGINT)
                   AS m2
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY o_custkey
    ), diffs AS (
        SELECT m2 - m1 AS dd FROM per
        WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m2 <> m1
    ), ranked AS (
        SELECT dd,
               2 * rank() OVER (ORDER BY abs(dd))
               + CAST(count(*) OVER (PARTITION BY abs(dd)) AS BIGINT) - 1
               AS r2
        FROM diffs
    ), tie AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DOUBLE)
               AS tsum
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM diffs
              GROUP BY abs(dd))
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN dd > 0 THEN r2 ELSE 0 END) AS BIGINT)
                   AS w2p
        FROM ranked
    )
    SELECT n AS n_pairs,
           CAST(w2p AS DOUBLE) / 2 AS w_plus,
           CAST(n AS DOUBLE) * (n + 1) / 2 - CAST(w2p AS DOUBLE) / 2
               AS w_minus,
           round((CAST(w2p AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - (SELECT tsum FROM tie) / 48), 4) AS z_stat
    FROM agg
    WHERE n >= 2
      AND CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
          > (SELECT tsum FROM tie) / 48
    """,
)
def wilcoxon_signed_rank_yearly_max(spark, sf_dir):
    """Wilcoxon signed-rank test — the PAIRED nonparametric member
    completing the rank-test family (Mann-Whitney is the unpaired
    two-sample, Kruskal-Wallis the k-sample): per customer active in
    both 1996 and 1997, did the yearly MAXIMUM order value shift?
    Zero differences drop (the standard convention); |d| midranks
    stay exact by the doubling trick (2r = 2·rank + tiesize − 1);
    W⁺/W⁻ emerge as exact half-integers with NO rounding, and the
    tie-corrected normal approximation z = (W⁺ − n(n+1)/4)/σ rounds
    at 4 dp (σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48, the cubic riding
    DECIMAL).  Guards: n >= 2 and a positive variance.  Scale: one
    fact aggregate to customer pairs, one global |d| rank (two-pass
    ranged at 100 TB)."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    per = (
        o.filter(yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(yr == 1996, _cents("o_totalprice"))).alias("m1"),
            F.max(F.when(yr == 1997, _cents("o_totalprice"))).alias("m2"),
        )
    )
    diffs = (
        per.filter(F.col("m1").isNotNull() & F.col("m2").isNotNull()
                   & (F.col("m1") != F.col("m2")))
        .select((F.col("m2") - F.col("m1")).alias("dd"))
        .localCheckpoint()  # pair-dictionary-sized; ranks + ties
    )
    r2 = (
        2 * F.rank().over(Window.orderBy(F.abs("dd")))
        + F.count("*").over(Window.partitionBy(F.abs("dd")))
        .cast("bigint") - 1
    )
    agg = diffs.select("dd", r2.alias("r2")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("dd") > 0, F.col("r2")).otherwise(0))
        .cast("bigint").alias("w2p"),
    )
    tie = (
        diffs.groupBy(F.abs("dd")).agg(F.count("*").alias("t"))
        .agg(F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")
                   * F.col("t") - F.col("t")).cast("double")
             .alias("tsum"))
    )
    return (
        agg.crossJoin(F.broadcast(tie))
        .filter((F.col("n") >= 2)
                & (F.expr("CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24")
                   > F.col("tsum") / 48))
        .select(
            F.col("n").alias("n_pairs"),
            (F.col("w2p").cast("double") / 2).alias("w_plus"),
            F.expr("CAST(n AS DOUBLE) * (n + 1) / 2 "
                   "- CAST(w2p AS DOUBLE) / 2").alias("w_minus"),
            F.expr("round((CAST(w2p AS DOUBLE) / 2 "
                   "- CAST(n AS DOUBLE) * (n + 1) / 4) "
                   "/ sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24 "
                   "- tsum / 48), 4)").alias("z_stat"),
        )
    )


@query(
    "friedman_test_yearly_max_ranks",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(max(floor(o_totalprice * 100)) AS BIGINT) AS mx
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997, 1998)
        GROUP BY 1, 2
    ), blocks AS (
        SELECT o_custkey FROM per GROUP BY 1 HAVING count(*) = 3
    ), x AS (
        SELECT p.o_custkey, p.y, p.mx
        FROM per p JOIN blocks b ON p.o_custkey = b.o_custkey
    ), ranked AS (
        SELECT o_custkey, y,
               2 * rank() OVER (PARTITION BY o_custkey ORDER BY mx)
               + CAST(count(*) OVER (PARTITION BY o_custkey, mx)
                      AS BIGINT) - 1 AS q
        FROM x
    ), colq AS (
        SELECT y, CAST(sum(q) AS BIGINT) AS qj FROM ranked GROUP BY y
    ), agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM blocks) AS b,
               (SELECT CAST(sum(qj * qj) AS BIGINT) FROM colq) AS sq2,
               (SELECT CAST(sum(q * q) AS BIGINT) FROM ranked) AS a2
    )
    SELECT b AS n_blocks, CAST(3 AS BIGINT) AS k_treatments,
           round(CAST(2 * (sq2 - b * b * 3 * 16) AS DOUBLE)
                 / (b * (a2 - b * 3 * 16)), 4) AS friedman_chi2
    FROM agg
    WHERE b >= 1 AND a2 - b * 3 * 16 > 0
    """,
)
def friedman_test_yearly_max_ranks(spark, sf_dir):
    """The Friedman test — k-treatment repeated measures on RANKS,
    pairing with the graded Cochran's Q (binary) and completing the
    within-block family: for customers active in all of 1996-1998,
    do the within-customer RANKINGS of yearly maximum order value
    shift systematically across years?  Tie-corrected form χ² =
    (k−1)[B − bk(k+1)²/4] / (A − bk(k+1)²/4) with A = Σ r², B =
    ΣR_j²/b — under the doubling trick (q = 2·rank + tiesize − 1
    within each 3-row block) every quantity is an exact integer and
    the statistic folds to 2·(ΣQ_j² − 48b²) / (b·(Σq² − 48b)) for
    k = 3, one rounded division.  Guards: >= 1 complete block and a
    positive tie-corrected denominator (all-tied blocks would zero
    it).  Scale: one fact aggregate to (customer, year), block
    ranking windows partitioned per customer, dictionary-tier
    totals."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("bigint")
    per = (
        o.filter(yr.isin(1996, 1997, 1998))
        .groupBy("o_custkey", yr.alias("y"))
        .agg(F.max(_cents("o_totalprice")).alias("mx"))
    )
    blocks = per.groupBy("o_custkey").agg(
        F.count("*").alias("ny")).filter(F.col("ny") == 3) \
        .select("o_custkey")
    x = per.join(blocks, "o_custkey")
    q = (
        2 * F.rank().over(
            Window.partitionBy("o_custkey").orderBy("mx"))
        + F.count("*").over(
            Window.partitionBy("o_custkey", "mx")).cast("bigint") - 1
    )
    ranked = x.select("y", q.alias("q")).localCheckpoint()
    colq = ranked.groupBy("y").agg(F.sum("q").cast("bigint").alias("qj"))
    agg = (
        blocks.agg(F.count("*").alias("b"))
        .crossJoin(F.broadcast(colq.agg(
            F.sum(F.col("qj") * F.col("qj")).cast("bigint").alias("sq2"))))
        .crossJoin(F.broadcast(ranked.agg(
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("a2"))))
    )
    return (
        agg.filter((F.col("b") >= 1)
                   & (F.col("a2") - F.col("b") * 48 > 0))
        .select(
            F.col("b").alias("n_blocks"),
            F.lit(3).cast("bigint").alias("k_treatments"),
            F.expr("round(CAST(2 * (sq2 - b * b * 3 * 16) AS DOUBLE) "
                   "/ (b * (a2 - b * 3 * 16)), 4)").alias("friedman_chi2"),
        )
    )
