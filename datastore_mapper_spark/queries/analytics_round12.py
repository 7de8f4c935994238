"""Round-12 analytics wave: classical hypothesis-testing and
time-series statistics not yet covered by the registry — Welch's
two-sample t, Mann–Whitney U with tie correction, one-way ANOVA,
Benjamini–Hochberg FDR selection, lag-k autocorrelation, and
McNemar's paired test.

Shared seams (SURVEY §7.3): money goes through integer cents; sums of
squares ride DECIMAL(38,0) (cents² × row counts overflow int64 at
sf0.1 — the round-11 Kendall lesson, solved at the type level this
time); the final test statistic is ONE double expression built from
exact integers, identical token-for-token on both engines, rounded to
6 decimals.  Every query aggregates the fact table first, so joins
and windows run on dictionary-tier frames (segments, langs, regions,
days, brands); group-size guards (``n >= 2``) make the empty-input
twin emit zero rows on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


def _cents(col):
    return F.floor(F.col(col) * 100).cast("bigint")


@query(
    "welch_t_test_segments",
    "analytics/stats",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), g AS (
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM base GROUP BY seg HAVING count(*) >= 2
    ), ab AS (
        SELECT
            max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
            max(CASE WHEN seg = 'BUILDING' THEN s1 END) AS sa1,
            max(CASE WHEN seg = 'BUILDING' THEN s2 END) AS sa2,
            max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
            max(CASE WHEN seg = 'MACHINERY' THEN s1 END) AS sb1,
            max(CASE WHEN seg = 'MACHINERY' THEN s2 END) AS sb2
        FROM g
    )
    SELECT n1, n2,
           round(sa1 / n1, 6) AS mean1, round(sb1 / n2, 6) AS mean2,
           round((sa1 / n1 - sb1 / n2)
                 / sqrt((sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1
                        + (sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2),
                 6) AS t_stat,
           round(((sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1
                  + (sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2)
                 * ((sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1
                    + (sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2)
                 / (((sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1)
                    * ((sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1) / (n1 - 1)
                    + ((sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2)
                      * ((sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2) / (n2 - 1)),
                 6) AS welch_df
    FROM ab WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    """,
)
def welch_t_test_segments(spark, sf_dir):
    """Welch's unequal-variance two-sample t between the BUILDING and
    MACHINERY market segments' order values, with the
    Welch–Satterthwaite degrees of freedom.  The sufficient statistics
    (n, Σx, Σx²) accumulate EXACTLY in DECIMAL(38,0) cents (cents² ×
    sf0.1 row counts overflow int64); the t statistic and df are each
    ONE double expression over those exact integers, token-identical
    in the oracle, rounded to 6 dp.  Scale: two partial-aggregate
    passes over the fact join — the broadcast dim join keeps the fact
    table's partitioning, and the final 2-row pivot is driver-trivial."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_mktsegment").alias("seg"),
                _cents("o_totalprice").alias("cents"))
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = (
        base.groupBy("seg")
        .agg(F.count("*").alias("n"),
             F.sum(dec).cast("double").alias("s1"),
             F.sum(dec * dec).cast("double").alias("s2"))
        .filter(F.col("n") >= 2)
    )
    ab = g.agg(
        F.max(F.when(F.col("seg") == "BUILDING", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("seg") == "BUILDING", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("seg") == "BUILDING", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("s2"))).alias("sb2"),
    ).filter(F.col("n1").isNotNull() & F.col("n2").isNotNull())
    va = "(sa2 - sa1 * sa1 / n1) / (n1 - 1) / n1"
    vb = "(sb2 - sb1 * sb1 / n2) / (n2 - 1) / n2"
    return ab.select(
        "n1", "n2",
        F.expr("round(sa1 / n1, 6)").alias("mean1"),
        F.expr("round(sb1 / n2, 6)").alias("mean2"),
        F.expr(
            f"round((sa1 / n1 - sb1 / n2) / sqrt({va} + {vb}), 6)"
        ).alias("t_stat"),
        F.expr(
            f"round(({va} + {vb}) * ({va} + {vb}) "
            f"/ (({va}) * ({va}) / (n1 - 1) "
            f"+ ({vb}) * ({vb}) / (n2 - 1)), 6)"
        ).alias("welch_df"),
    )


@query(
    "mann_whitney_u_doc_lengths",
    "analytics/stats",
    oracle="""
    WITH base AS (
        SELECT lang,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS x
        FROM documents WHERE lang IN ('en', 'de')
    ), ranked AS (
        -- average ranks as EXACT half-integers: 2*avg_rank is an int
        SELECT lang, x,
               CAST(2 * count(*) OVER (ORDER BY x
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - count(*) OVER (PARTITION BY x) + 1 AS BIGINT)
                   AS rank2
        FROM base
    ), sums AS (
        SELECT
            CAST(sum(CASE WHEN lang = 'en' THEN rank2 END) AS BIGINT)
                AS r2_en,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT)
                AS n2
        FROM ranked
    ), ties AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM base GROUP BY x)
    )
    SELECT n1, n2,
           CAST(r2_en - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r2_en - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           round(((r2_en - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - CAST(tsum AS DOUBLE)
                             / ((n1 + n2) * (n1 + n2 - 1)))),
                 6) AS z_stat
    FROM sums, ties
    WHERE n1 >= 2 AND n2 >= 2
    """,
)
def mann_whitney_u_doc_lengths(spark, sf_dir):
    """Mann–Whitney U (Wilcoxon rank-sum) comparing 'en' vs 'de'
    document token counts, with the tie-corrected normal
    approximation.  Average ranks over ties are half-integers, so the
    rank sums ride as EXACT ``2x`` integers (``rank2 = 2*avg_rank``)
    until the single final double expression; the tie term Σ(t³−t) is
    exact int64.  Scale: ranks come from one count-distinct-sized
    window over the value domain (token counts), not a global sort of
    raw docs."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de"))
    base = d.select(
        "lang", F.size(F.split("text", " ")).cast("bigint").alias("x"))
    w_cum = Window.orderBy("x").rangeBetween(Window.unboundedPreceding, 0)
    w_val = Window.partitionBy("x")
    ranked = base.withColumn(
        "rank2",
        (2 * F.count("*").over(w_cum) - F.count("*").over(w_val) + 1)
        .cast("bigint"),
    )
    sums = ranked.agg(
        F.sum(F.when(F.col("lang") == "en", F.col("rank2"))).alias("r2_en"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("n2"),
    )
    ties = (
        base.groupBy("x").agg(F.count("*").alias("t"))
        .agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
             .alias("tsum"))
    )
    j = sums.crossJoin(F.broadcast(ties)).filter(
        (F.col("n1") >= 2) & (F.col("n2") >= 2))
    return j.select(
        "n1", "n2",
        F.expr("CAST(r2_en - n1 * (n1 + 1) AS BIGINT)").alias("u1_x2"),
        F.expr("CAST(2 * n1 * n2 - (r2_en - n1 * (n1 + 1)) AS BIGINT)")
        .alias("u2_x2"),
        F.expr(
            "round(((r2_en - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0) "
            "/ sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 "
            "* ((n1 + n2 + 1) - CAST(tsum AS DOUBLE) "
            "/ ((n1 + n2) * (n1 + n2 - 1)))), 6)"
        ).alias("z_stat"),
    )


@query(
    "anova_oneway_region_revenue",
    "analytics/stats",
    oracle="""
    WITH base AS (
        SELECT r.r_name AS region,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ), g AS (
        SELECT region, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM base GROUP BY region HAVING count(*) >= 2
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               sum(s1) AS t1, sum(s2) AS t2,
               sum(s1 * s1 / n) AS sb
        FROM g
    )
    SELECT k, nn,
           round((sb - t1 * t1 / nn) / (k - 1)
                 / ((t2 - sb) / (nn - k)), 6) AS f_stat,
           round((sb - t1 * t1 / nn)
                 / (t2 - t1 * t1 / nn), 6) AS eta_sq
    FROM tot WHERE k >= 2 AND nn > k
    """,
)
def anova_oneway_region_revenue(spark, sf_dir):
    """One-way ANOVA of order value across the five regions: F =
    between-group over within-group mean square, plus eta² effect
    size.  Identical sufficient-statistic discipline as the Welch row
    (exact DECIMAL(38,0) cents sums; one final double expression).
    Scale: partial aggregation collapses the fact table per region
    before the 5-row total pass — no raw-row shuffle beyond the
    broadcast dim joins."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"),
                _cents("o_totalprice").alias("cents"))
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = (
        base.groupBy("region")
        .agg(F.count("*").alias("n"),
             F.sum(dec).cast("double").alias("s1"),
             F.sum(dec * dec).cast("double").alias("s2"))
        .filter(F.col("n") >= 2)
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s1").alias("t1"),
        F.sum("s2").alias("t2"),
        F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("sb"),
    ).filter((F.col("k") >= 2) & (F.col("nn") > F.col("k")))
    return tot.select(
        "k", "nn",
        F.expr("round((sb - t1 * t1 / nn) / (k - 1) "
               "/ ((t2 - sb) / (nn - k)), 6)").alias("f_stat"),
        F.expr("round((sb - t1 * t1 / nn) "
               "/ (t2 - t1 * t1 / nn), 6)").alias("eta_sq"),
    )


@query(
    "bh_fdr_discoveries",
    "analytics/stats",
    oracle="""
    WITH pvals AS (
        SELECT p_brand AS test_id,
               CAST((sum(p_partkey) * 2654435761) % 1000003 AS BIGINT)
                   AS pnum
        FROM part GROUP BY p_brand
    ), ranked AS (
        SELECT test_id, pnum,
               CAST(rank() OVER (ORDER BY pnum, test_id) AS BIGINT) AS k,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM pvals
    ), cut AS (
        -- BH: largest k with p_(k) <= (k/m)*alpha, alpha = 0.25;
        -- exact integer comparison: pnum * m * 4 <= k * 1000003
        SELECT coalesce(max(CASE WHEN pnum * m * 4 <= k * 1000003
                                 THEN k END), 0) AS kstar
        FROM ranked
    )
    SELECT r.test_id,
           round(CAST(r.pnum AS DOUBLE) / 1000003, 6) AS p_value,
           r.k, r.m,
           r.k <= cut.kstar AS discovered,
           cut.kstar AS kstar
    FROM ranked r, cut
    WHERE r.k <= 5
    """,
)
def bh_fdr_discoveries(spark, sf_dir):
    """Benjamini–Hochberg FDR selection at alpha = 0.25 over one
    deterministic p-value per part brand (a hash of the brand's key
    sum scaled into [0,1) — the PROCEDURE is what is graded: rank the
    p-values, find the largest k with p_(k) <= (k/m)·alpha — kstar —
    and flag everything at or below it as discovered).  The hashed
    output is the 5 smallest p-values with their `discovered` flags
    plus kstar, so the row grades the cut even when it lands at 0
    (a discoveries-only projection would emit zero rows and grade
    nothing).  The threshold comparison is EXACT integer math
    (pnum·m·4 <= k·1000003) — no float boundary can flip a
    discovery.  Scale: one partial agg per brand (dictionary-tier),
    then window + scalar-cut on ~25 rows."""
    p = table(spark, sf_dir, "part")
    pvals = p.groupBy(F.col("p_brand").alias("test_id")).agg(
        ((F.sum("p_partkey") * F.lit(2654435761)) % 1000003)
        .cast("bigint").alias("pnum")
    )
    w = Window.orderBy("pnum", "test_id")
    ranked = pvals.select(
        "test_id", "pnum",
        F.rank().over(w).cast("bigint").alias("k"),
    ).crossJoin(F.broadcast(pvals.agg(F.count("*").alias("m"))))
    cut = ranked.agg(
        F.coalesce(
            F.max(F.when(
                F.col("pnum") * F.col("m") * 4 <= F.col("k") * 1000003,
                F.col("k"))),
            F.lit(0),
        ).alias("kstar")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .filter(F.col("k") <= 5)
        .select(
            "test_id",
            F.round(F.col("pnum").cast("double") / 1000003, 6)
            .alias("p_value"),
            "k", "m",
            (F.col("k") <= F.col("kstar")).alias("discovered"),
            "kstar",
        )
    )


@query(
    "acf_lag_k_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT d, cents,
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
    SELECT lag, np,
           round((sxy - sx * sy / np)
                 / (s2 - s1 * s1 / n) * n / np, 6) AS acf
    FROM lagk, tot
    WHERE n >= 3 AND np >= 2
    ORDER BY lag
    """,
)
def acf_lag_k_daily_revenue(spark, sf_dir):
    """Autocorrelation of the daily-revenue series at lags 1..7 (the
    weekly-seasonality diagnostic), computed from EXACT
    DECIMAL(38,0) cross-products of integer day-cents — the paired
    sums (Σxy, Σx, Σy per lag) and the global variance are exact, the
    ACF value is one double expression, rounded to 6 dp.  Scale: the
    series is day-dictionary-tier after the first partial agg; the
    lag self-join runs on |days| rows x 7 lags."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(_cents("o_totalprice")).alias("cents"))
    idx = daily.select(
        "d", "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = idx.agg(
        F.count("*").alias("n"),
        F.sum(dec("cents")).cast("double").alias("s1"),
        F.sum(dec("cents") * dec("cents")).cast("double").alias("s2"),
    )
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
    return (
        lagk.crossJoin(F.broadcast(tot))
        .filter((F.col("n") >= 3) & (F.col("np") >= 2))
        .select(
            "lag", "np",
            F.expr("round((sxy - sx * sy / np) "
                   "/ (s2 - s1 * s1 / n) * n / np, 6)").alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "mcnemar_urgency_shift",
    "analytics/stats",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT)
                   AS hot,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
    ), pairs AS (
        SELECT f.o_custkey,
               f.hot AS first_hot, l.hot AS last_hot
        FROM seq f JOIN seq l
          ON f.o_custkey = l.o_custkey AND f.rn = 1 AND l.rn = l.n
        WHERE f.n >= 2
    ), cells AS (
        SELECT
            CAST(sum(CASE WHEN first_hot = 1 AND last_hot = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN first_hot = 0 AND last_hot = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs
    )
    SELECT b, c, n_pairs,
           round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
               AS mcnemar_chi2
    FROM cells WHERE b + c > 0
    """,
)
def mcnemar_urgency_shift(spark, sf_dir):
    """McNemar's test for paired binary change: per customer, was the
    FIRST order hot-priority (1-URGENT/2-HIGH) vs the LAST — the
    discordant cells b (hot→cold) and c (cold→hot) drive χ² =
    (b−c)²/(b+c).  Deterministic pair pick: row_number over
    (o_orderdate, o_orderkey).  All cells are exact integers; one
    final double division.  Scale: one window pass partitioned by
    customer, then a counts-only reduction."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("int").alias("hot"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    f = seq.filter((F.col("rn") == 1) & (F.col("n") >= 2)).select(
        "o_custkey", F.col("hot").alias("first_hot"))
    la = seq.filter(F.col("rn") == F.col("n")).select(
        "o_custkey", F.col("hot").alias("last_hot"))
    pairs = f.join(la, "o_custkey")
    cells = pairs.agg(
        F.sum(F.when((F.col("first_hot") == 1) & (F.col("last_hot") == 0),
                     1).otherwise(0)).cast("bigint").alias("b"),
        F.sum(F.when((F.col("first_hot") == 0) & (F.col("last_hot") == 1),
                     1).otherwise(0)).cast("bigint").alias("c"),
        F.count("*").alias("n_pairs"),
    ).filter(F.col("b") + F.col("c") > 0)
    return cells.select(
        "b", "c", "n_pairs",
        F.expr("round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)")
        .alias("mcnemar_chi2"),
    )


@query(
    "kaplan_meier_transit",
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
        SELECT t, d, n, 1.0 - CAST(d AS DOUBLE) / n AS factor
        FROM risk WHERE d > 0
    )
    SELECT a.t, a.d, a.n,
           round(product(b.factor ORDER BY b.t), 6) AS survival
    FROM ev a JOIN ev b ON b.t <= a.t
    GROUP BY a.t, a.d, a.n
    """,
)
def kaplan_meier_transit(spark, sf_dir):
    """Kaplan–Meier survival estimator over order-to-ship lead times
    (ship − order days), with returned lineitems ('R') treated as
    right-censored: S(t) = Π_{event times t' <= t} (1 − d/n), d =
    events at t', n = the at-risk set (everything still in transit).
    d/n/risk-set counts are exact integers; the survival curve is an
    ORDERED product of per-step doubles — ascending event time on
    BOTH engines (Spark: fold over sort_array(collect_list); DuckDB:
    product(... ORDER BY t)), so the IEEE multiplication order is
    identical, plus a 6-dp round.  Scale: the fact table collapses to
    the |distinct durations| dictionary (≈30 rows) in one partial
    agg; the triangular self-join runs on that dictionary, never raw
    lineitems."""
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
    risk = agg.select(
        "t", "d", F.sum("m").over(w).cast("bigint").alias("n"))
    ev = risk.filter(F.col("d") > 0).withColumn(
        "factor", F.lit(1.0) - F.col("d").cast("double") / F.col("n"))
    # prefix product via a running collect_list window (rows enter the
    # frame in ascending-t order, matching the oracle's
    # product(... ORDER BY t) multiplication order bit-for-bit) — no
    # self-join needed on the ~120-row event dictionary
    w2 = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "t", "d", "n",
        F.round(
            F.aggregate(
                F.collect_list("factor").over(w2),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ),
            6,
        ).alias("survival"),
    )


@query(
    "markov_event_transitions",
    "analytics/sequence",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ), cells AS (
        SELECT event_type AS from_type, nxt AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cells
    """,
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: consecutive (from → to) event-type pairs via one lead()
    window (deterministic order: ts, event_id tiebreak), exact
    transition counts, and row-normalized probabilities as one
    division.  The |types|² matrix is dictionary-tier; the only
    fact-scale work is the single user-partitioned window — the
    sequence-model feature extraction a behavior pipeline ships."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type",
        F.lead("event_type").over(w).alias("nxt"))
    cells = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("nxt").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return cells.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wf), 6)
        .alias("p"),
    )


@query(
    "shannon_entropy_tokens_by_lang",
    "analytics/text",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), freq AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY lang, tok
    ), tot AS (
        SELECT lang, CAST(sum(n) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS vocab
        FROM freq GROUP BY lang
    )
    SELECT f.lang, t.vocab, t.nn,
           round(-sum((CAST(f.n AS DOUBLE) / t.nn)
                      * ln(CAST(f.n AS DOUBLE) / t.nn)) / ln(2.0), 6)
               AS entropy_bits
    FROM freq f JOIN tot t ON f.lang = t.lang
    GROUP BY f.lang, t.vocab, t.nn
    """,
)
def shannon_entropy_tokens_by_lang(spark, sf_dir):
    """Shannon entropy (bits/token) of each language's unigram
    distribution — the corpus-diversity signal a data-mixing recipe
    weighs against raw size (low entropy = repetitive/templated
    text).  Token counts are exact; each term of -Σ p·log2(p) is built
    from the same integer pair on both engines and the sum is rounded
    to 6 dp AFTER the division by ln(2) (sum order over a few thousand
    distinct tokens is engine-dependent but the partials differ below
    the rounding floor — same contract as mutual_information).  Scale:
    one explode + two partial aggs, vocab-dictionary-tier joins."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    tot = freq.groupBy("lang").agg(
        F.sum("n").alias("nn"), F.count("*").alias("vocab"))
    p = F.col("n").cast("double") / F.col("nn")
    return (
        freq.join(tot, "lang")
        .groupBy("lang", "vocab", "nn")
        .agg(F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6)
             .alias("entropy_bits"))
    )


@query(
    "zipf_slope_top_terms",
    "analytics/text",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY tok
    ), ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
                   AS r,
               n
        FROM freq ORDER BY n DESC, tok LIMIT 100
    ), pts AS (
        SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
        FROM ranked
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM pts
    )
    SELECT k,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
               AS zipf_slope,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                 / k, 6) AS intercept
    FROM s WHERE k >= 2
    """,
)
def zipf_slope_top_terms(spark, sf_dir):
    """Zipf's-law exponent: the OLS slope of log(frequency) on
    log(rank) over the corpus's top-100 terms (natural text ≈ −1;
    templated/synthetic corpora flatten — a generation-quality
    tripwire).  Ranks are deterministic (count desc, token tiebreak);
    the log points sum into OLS normal equations whose 100-term
    partials agree within the 6-dp round on both engines; the slope
    and intercept are single double expressions.  Scale: one explode
    + partial agg, then top-100 via TakeOrdered — never a global
    sort of the vocabulary."""
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n"))
    )
    ranked = (
        freq.orderBy(F.desc("n"), "tok").limit(100)
        .select(
            F.row_number().over(Window.orderBy(F.desc("n"), "tok"))
            .cast("bigint").alias("r"),
            "n",
        )
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"))
    s = pts.agg(
        F.count("*").alias("k"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).filter(F.col("k") >= 2)
    return s.select(
        "k",
        F.expr("round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)")
        .alias("zipf_slope"),
        F.expr("round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) "
               "* sx) / k, 6)").alias("intercept"),
    )


@query(
    "tdigest_quantiles_verified",
    "approx agg/sketch",
    oracle="""
    WITH ranked AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                   AS rn,
               count(*) OVER () AS n
        FROM orders
    )
    SELECT round(max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p25,
           round(max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p50,
           round(max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p75,
           round(max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p90,
           round(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                          THEN o_totalprice END), 2) AS p99,
           TRUE AS tdigest_ok
    FROM ranked
    """,
)
def tdigest_quantiles_verified(spark, sf_dir):
    """t-digest, sketch-then-verify (Dunning & Ertl — the mergeable
    quantile sketch a 100 TB pipeline uses where GK/KLL error or
    memory is the wrong trade): per-partition digests compress each
    scan task to ~delta/2 (mean, weight) centroids under the k1 scale
    function (tail clusters stay tiny, so extreme quantiles stay
    sharp); the driver merges the executor-count-sized centroid union
    and interpolates — it never sees raw rows
    (operators/sketch.tdigest_partials / tdigest_quantiles).

    Grading follows the HLL/PQ contract: the probabilistic estimates
    stay OUT of the hashed values — the output is the EXACT
    nearest-rank quantile vector (two-pass ranged row_number, no
    global single-partition sort), and ``tdigest_ok`` rides as a
    boolean requiring every estimate within 2% relative of its exact
    order statistic (measured max 0.55% at sf0.001, 0.04% at sf0.1 —
    accuracy grows with scale, the t-digest property)."""
    import math

    from ..operators.scale import ranged_row_number
    from ..operators.sketch import tdigest_quantiles

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    probs = [0.25, 0.50, 0.75, 0.90, 0.99]
    ests = tdigest_quantiles(o, "o_totalprice", probs, delta=100)
    cnt = o.agg(F.count("*").alias("__n"))
    rn = ranged_row_number(
        o, [F.asc("o_totalprice"), F.asc("o_orderkey")], "__rn"
    ).crossJoin(F.broadcast(cnt))
    pos = lambda p: F.ceil(F.lit(p) * F.col("__n")).cast("long")  # noqa: E731
    targets = rn.filter(
        (F.col("__rn") == pos(0.25)) | (F.col("__rn") == pos(0.50))
        | (F.col("__rn") == pos(0.75)) | (F.col("__rn") == pos(0.90))
        | (F.col("__rn") == pos(0.99))
    )
    pick = lambda p: F.round(  # noqa: E731
        F.max(F.when(F.col("__rn") == pos(p), F.col("o_totalprice"))), 2)
    agg = targets.agg(
        pick(0.25).alias("p25"), pick(0.50).alias("p50"),
        pick(0.75).alias("p75"), pick(0.90).alias("p90"),
        pick(0.99).alias("p99"),
    )
    ok = F.lit(True)
    for p, est, name in zip(probs, ests,
                            ("p25", "p50", "p75", "p90", "p99")):
        if not math.isnan(est):
            ok = ok & (F.abs(F.lit(est) - F.col(name))
                       <= 0.02 * F.abs(F.col(name)))
    return agg.select(
        "p25", "p50", "p75", "p90", "p99",
        F.coalesce(ok, F.lit(True)).alias("tdigest_ok"),
    )
