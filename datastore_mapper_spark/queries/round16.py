"""Round-16 additions: the classical-statistics second ring
(variance homogeneity, post-hoc comparisons, partial autocorrelation,
heteroscedasticity, influence diagnostics, reliability/agreement
coefficients) and the text-pipeline trio (lexical concentration,
out-of-vocabulary accounting, PII redaction).

House rules throughout (SURVEY §7.3-H2): every statistic reduces to
integer / decimal(38,0) sufficient statistics aggregated exactly,
finished by ONE token-identical double expression rounded 4-6 dp on
both engines; degenerate inputs are excluded by identical guards.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _dec(e):
    return e.cast("decimal(38,0)")


@query(
    "bartlett_test_segments",
    "analytics/stats",
    oracle="""
    WITH v AS (
        SELECT c.c_mktsegment AS seg,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sx,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sxx
        FROM v GROUP BY seg
        HAVING count(*) >= 2
    ), terms AS (
        SELECT seg, n,
               (CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS s2
        FROM g
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_total,
               sum((n - 1) * ln(s2)) AS sum_dfln,
               sum((n - 1) * s2) AS pooled_num,
               sum(1.0 / (n - 1)) AS sum_inv
        FROM terms
        WHERE s2 > 0
    )
    SELECT k, n_total,
           round(((n_total - k) * ln(pooled_num / (n_total - k))
                  - sum_dfln)
                 / (1.0 + (sum_inv - 1.0 / (n_total - k))
                          / (3.0 * (k - 1))), 4) AS bartlett_x2,
           CAST(k - 1 AS BIGINT) AS df
    FROM s WHERE k >= 2
    """,
)
def bartlett_test_segments(spark, sf_dir):
    """BARTLETT'S TEST of variance homogeneity across the five
    market segments on order value — the chi-square counterpart of
    the existing Brown-Forsythe row (Bartlett is the classical,
    normality-sensitive version; BF is the robust one — together
    they are the pair every ANOVA pipeline reports).  Per-group
    sample variances come from exact integer sufficient statistics
    (n, Σcents, Σcents² in DECIMAL(38,0)); the statistic
    X² = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with the Bartlett
    correction C is one double expression over the 5-row group
    frame.  Scale: one shuffled agg on the join key, then a 5-row
    reduction — dictionary-tier after the first rollup."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    v = (o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
                o.o_custkey == F.col("c_custkey"))
         .select(F.col("c_mktsegment").alias("seg"),
                 cents.alias("cents")))
    g = (v.groupBy("seg")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum(_dec(F.col("cents"))).cast("decimal(38,0)")
              .alias("sx"),
              F.sum(_dec(F.col("cents")) * _dec(F.col("cents")))
              .cast("decimal(38,0)").alias("sxx"))
         .filter(F.col("n") >= 2))
    nD = F.col("n").cast("double")
    s2 = ((F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double")
           / nD) / (nD - 1))
    terms = g.select("seg", "n", s2.alias("s2")).filter(F.col("s2") > 0)
    s = terms.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sum_dfln"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_num"),
        F.sum(F.lit(1.0) / (F.col("n") - 1)).alias("sum_inv"),
    )
    ntk = (F.col("n_total") - F.col("k")).cast("double")
    x2 = ((ntk * F.log(F.col("pooled_num") / ntk) - F.col("sum_dfln"))
          / (F.lit(1.0) + (F.col("sum_inv") - F.lit(1.0) / ntk)
             / (F.lit(3.0) * (F.col("k") - 1))))
    return (
        s.filter(F.col("k") >= 2)
        .select("k", "n_total", F.round(x2, 4).alias("bartlett_x2"),
                (F.col("k") - 1).cast("bigint").alias("df"))
    )


@query(
    "tukey_hsd_region_revenue",
    "analytics/stats",
    oracle="""
    WITH v AS (
        SELECT n.n_regionkey AS region,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    ), g AS (
        SELECT region,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sx,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sxx
        FROM v GROUP BY region
        HAVING count(*) >= 2
    ), msw AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS k,
               sum(CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                   AS ssw
        FROM g
    )
    SELECT a.region AS region_a, b.region AS region_b,
           round((CAST(a.sx AS DOUBLE) / a.n
                  - CAST(b.sx AS DOUBLE) / b.n)
                 / sqrt(msw.ssw / (msw.n_total - msw.k) / 2.0
                        * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat,
           CAST(msw.n_total - msw.k AS BIGINT) AS df_within
    FROM g a JOIN g b ON a.region < b.region
    CROSS JOIN msw
    WHERE msw.n_total > msw.k
    """,
)
def tukey_hsd_region_revenue(spark, sf_dir):
    """TUKEY'S HSD post-hoc comparisons after the existing one-way
    ANOVA row (`anova_oneway_region_revenue`): for every PAIR of the
    five regions, the studentized-range statistic
    q = (x̄ᵃ − x̄ᵇ) / √(MSW/2 · (1/nᵃ + 1/nᵇ)) with MSW pooled from
    the exact per-region integer sufficient statistics — the
    Tukey-Kramer unequal-n form.  Emitting the statistic (not an
    accept/reject against the studentized-range quantile, which is a
    table lookup, not data math) keeps the row purely computational
    and hash-exact.  Scale: the pair frame is 10 rows over a 5-row
    group frame — everything after the first rollup is
    dictionary-tier; the MSW scalar rides a broadcast cross join."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    v = (o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                o.o_custkey == F.col("c_custkey"))
         .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .select(F.col("n_regionkey").alias("region"),
                 cents.alias("cents")))
    g = (v.groupBy("region")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum(_dec(F.col("cents"))).cast("decimal(38,0)")
              .alias("sx"),
              F.sum(_dec(F.col("cents")) * _dec(F.col("cents")))
              .cast("decimal(38,0)").alias("sxx"))
         .filter(F.col("n") >= 2)
         .localCheckpoint())
    ssw_term = (F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / F.col("n"))
    msw = g.agg(F.sum("n").cast("bigint").alias("n_total"),
                F.count("*").cast("bigint").alias("k"),
                F.sum(ssw_term).alias("ssw"))
    a = g.select(F.col("region").alias("region_a"),
                 F.col("n").alias("na"), F.col("sx").alias("sxa"))
    b = g.select(F.col("region").alias("region_b"),
                 F.col("n").alias("nb"), F.col("sx").alias("sxb"))
    q = ((F.col("sxa").cast("double") / F.col("na")
          - F.col("sxb").cast("double") / F.col("nb"))
         / F.sqrt(F.col("ssw") / (F.col("n_total") - F.col("k"))
                  / F.lit(2.0)
                  * (F.lit(1.0) / F.col("na")
                     + F.lit(1.0) / F.col("nb"))))
    return (
        a.join(F.broadcast(b), F.col("region_a") < F.col("region_b"))
        .crossJoin(F.broadcast(msw))
        .filter(F.col("n_total") > F.col("k"))
        .select("region_a", "region_b", F.round(q, 4).alias("q_stat"),
                (F.col("n_total") - F.col("k")).cast("bigint")
                .alias("df_within"))
    )


@query(
    "pacf_yule_walker_daily",
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
        FROM (SELECT unnest(generate_series(1, 3)) AS lag) l
        JOIN idx a ON TRUE
        JOIN idx b ON b.i = a.i + l.lag
        GROUP BY l.lag
    ), r AS (
        SELECT
            max(CASE WHEN lag = 1 THEN (sxy - sx * sy / np)
                     / (s2 - s1 * s1 / n) * n / np END) AS r1,
            max(CASE WHEN lag = 2 THEN (sxy - sx * sy / np)
                     / (s2 - s1 * s1 / n) * n / np END) AS r2,
            max(CASE WHEN lag = 3 THEN (sxy - sx * sy / np)
                     / (s2 - s1 * s1 / n) * n / np END) AS r3
        FROM lagk, tot
        WHERE n >= 3 AND np >= 2
    )
    SELECT n,
           round(r1, 6) AS pacf1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf2,
           round((r3 - 2 * r1 * r2 - r1 * r1 * r3
                  + r1 * r2 * r2 + r1 * r1 * r1)
                 / (1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 - r2 * r2), 6)
               AS pacf3
    FROM r, tot
    WHERE n >= 10
      AND abs(1 - r1 * r1) > 1e-12
      AND abs(1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 - r2 * r2) > 1e-12
    """,
)
def pacf_yule_walker_daily(spark, sf_dir):
    """PARTIAL autocorrelation of the daily-revenue series at lags
    1-3 — the AR-order diagnostic that complements the existing ACF
    row (`acf_lag_k_daily_revenue`): PACF at lag k is the lag-k
    coefficient of the Yule-Walker AR(k) fit, i.e. the correlation
    REMAINING after the shorter lags are partialled out.  For k <= 3
    the Durbin-Levinson recursion collapses to closed Cramer-rule
    forms over the ACF values (φ11 = r1; φ22 = (r2−r1²)/(1−r1²);
    φ33 = det(R₃ with its last column replaced by [r1 r2 r3]) /
    det(R₃), both determinants expanded symbolically) — so the whole
    statistic is one double expression over the SAME exact
    DECIMAL(38,0) lag cross-products the ACF row aggregates, rounded
    6 dp, with identical singularity guards on both engines
    (pytest cross-checks the expansion against a numpy
    Durbin-Levinson reference).  Scale: day-dictionary-tier after
    the first rollup; the lag grid is 3 rows."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).cast("bigint").alias("cents"))
    idx = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint")
        .alias("i"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = idx.agg(
        F.count("*").alias("n"),
        F.sum(dec("cents")).cast("double").alias("s1"),
        F.sum(dec("cents") * dec("cents")).cast("double").alias("s2"))
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    a, b = idx.alias("a"), idx.alias("b")
    lagk = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("a.cents").cast("decimal(38,0)")
                   * F.col("b.cents").cast("decimal(38,0)"))
             .cast("double").alias("sxy"),
             F.sum(F.col("a.cents").cast("decimal(38,0)"))
             .cast("double").alias("sx"),
             F.sum(F.col("b.cents").cast("decimal(38,0)"))
             .cast("double").alias("sy"),
             F.count("*").alias("np")))
    acf = ("(sxy - sx * sy / np) / (s2 - s1 * s1 / n) * n / np")
    r = (lagk.crossJoin(F.broadcast(tot))
         .filter((F.col("n") >= 3) & (F.col("np") >= 2))
         .agg(F.max(F.expr(f"CASE WHEN lag = 1 THEN {acf} END"))
              .alias("r1"),
              F.max(F.expr(f"CASE WHEN lag = 2 THEN {acf} END"))
              .alias("r2"),
              F.max(F.expr(f"CASE WHEN lag = 3 THEN {acf} END"))
              .alias("r3")))
    return (
        r.crossJoin(F.broadcast(tot))
        .filter(F.expr(
            "n >= 10 AND abs(1 - r1 * r1) > 1e-12 "
            "AND abs(1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 - r2 * r2) "
            "> 1e-12"))
        .select(
            "n",
            F.expr("round(r1, 6)").alias("pacf1"),
            F.expr("round((r2 - r1 * r1) / (1 - r1 * r1), 6)")
            .alias("pacf2"),
            F.expr("round((r3 - 2 * r1 * r2 - r1 * r1 * r3 "
                   "+ r1 * r2 * r2 + r1 * r1 * r1) "
                   "/ (1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 "
                   "- r2 * r2), 6)").alias("pacf3"))
    )


_OLS_DAILY_SQL = """
    daily AS (
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
               CAST(sum(i) AS BIGINT) AS st,
               CAST(sum(i * i) AS BIGINT) AS stt,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(i * CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                   AS sty
        FROM idx
    ), coef AS (
        SELECT n, st, stt,
               (n * sty - st * sy) / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) AS b,
               (sy - (n * sty - st * sy) / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) * st) / n AS a
        FROM tot
        WHERE n >= 3 AND n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st > 0
    ), resid AS (
        SELECT idx.i, idx.d, idx.cents,
               CAST(idx.cents AS DOUBLE) - coef.a - coef.b * idx.i AS u
        FROM idx, coef
    )
"""


@query(
    "breusch_pagan_daily_trend",
    "analytics/stats",
    oracle="WITH " + _OLS_DAILY_SQL + """
    , aux AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(u * u) AS su2,
               sum(u * u * u * u) AS su4,
               sum(i * u * u) AS stu2,
               CAST(sum(i) AS DOUBLE) AS st,
               CAST(sum(CAST(i AS DOUBLE) * i) AS DOUBLE) AS stt
        FROM resid
    )
    SELECT n,
           round((SELECT b FROM coef), 6) AS slope,
           round(n * ((n * stu2 - st * su2) * (n * stu2 - st * su2))
                 / ((n * stt - st * st) * (n * su4 - su2 * su2)), 4)
               AS lm_bp,
           CAST(1 AS BIGINT) AS df
    FROM aux
    WHERE n >= 3 AND n * su4 - su2 * su2 > 0
      AND n * stt - st * st > 0
    """,
)
def breusch_pagan_daily_trend(spark, sf_dir):
    """BREUSCH-PAGAN heteroscedasticity test on the daily-revenue ~
    day-index OLS trend (the regression the existing
    `regression_price_trend` / Theil-Sen rows fit): the LM statistic
    is n·R² of the auxiliary regression of squared residuals on the
    regressor, which for a single regressor collapses to
    n·corr²(u², t) — one double expression over six aggregate sums.
    The OLS coefficients come from EXACT integer/decimal sums (Σi,
    Σi², Σi·cents in DECIMAL(38,0)); residuals are the identical
    per-row double expression on both engines; the aux sums are
    double (rounded 4 dp at the finish, the zipf-slope precedent).
    Scale: day-dictionary-tier after the first rollup; the
    coefficient scalar rides a broadcast cross join."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).cast("bigint").alias("cents"))
    idx = daily.select(
        "d", "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint")
        .alias("i"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = idx.agg(
        F.count("*").alias("n"),
        F.sum("i").cast("bigint").alias("st"),
        F.sum(F.col("i") * F.col("i")).cast("bigint").alias("stt"),
        F.sum(dec("cents")).cast("double").alias("sy"),
        F.sum(F.col("i") * dec("cents")).cast("double").alias("sty"))
    coef = (tot.filter(F.expr(
        "n >= 3 AND n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st "
        "> 0"))
        .select(F.expr(
            "(n * sty - st * sy) / (n * CAST(stt AS DOUBLE) "
            "- CAST(st AS DOUBLE) * st)").alias("b"),
            F.expr(
            "(sy - (n * sty - st * sy) / (n * CAST(stt AS DOUBLE) "
            "- CAST(st AS DOUBLE) * st) * st) / n").alias("a")))
    resid = (idx.crossJoin(F.broadcast(coef))
             .select("i", F.expr("CAST(cents AS DOUBLE) - a - b * i")
                     .alias("u")))
    aux = resid.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("u * u")).alias("su2"),
        F.sum(F.expr("u * u * u * u")).alias("su4"),
        F.sum(F.expr("i * u * u")).alias("stu2"),
        F.sum("i").cast("double").alias("st"),
        F.sum(F.expr("CAST(i AS DOUBLE) * i")).alias("stt"))
    return (
        aux.crossJoin(F.broadcast(coef))
        .filter(F.expr("n >= 3 AND n * su4 - su2 * su2 > 0 "
                       "AND n * stt - st * st > 0"))
        .select(
            "n",
            F.expr("round(b, 6)").alias("slope"),
            F.expr("round(n * ((n * stu2 - st * su2) "
                   "* (n * stu2 - st * su2)) "
                   "/ ((n * stt - st * st) * (n * su4 - su2 * su2)), 4)")
            .alias("lm_bp"),
            F.lit(1).cast("bigint").alias("df"))
    )


@query(
    "cooks_distance_daily_trend",
    "analytics/stats",
    oracle="WITH " + _OLS_DAILY_SQL + """
    , s AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(u * u) AS sse
        FROM resid
    ), hd AS (
        SELECT r.d, r.cents, r.u,
               1.0 / t.n
               + (r.i - CAST(t.st AS DOUBLE) / t.n)
                 * (r.i - CAST(t.st AS DOUBLE) / t.n)
                 / (CAST(t.stt AS DOUBLE)
                    - CAST(t.st AS DOUBLE) * t.st / t.n) AS h
        FROM resid r, tot t
        WHERE t.n >= 4
          AND CAST(t.stt AS DOUBLE) - CAST(t.st AS DOUBLE) * t.st / t.n
              > 0
    ), dk AS (
        SELECT hd.d, hd.cents,
               round(hd.u * hd.u / (2.0 * (s.sse / (s.n - 2)))
                     * hd.h / ((1 - hd.h) * (1 - hd.h)), 8) AS cooks_d,
               round(hd.h, 6) AS leverage
        FROM hd, s
        WHERE s.sse > 0
    )
    SELECT CAST(row_number() OVER (ORDER BY cooks_d DESC, d) AS BIGINT)
               AS rk,
           d AS day, cents, cooks_d, leverage
    FROM dk
    QUALIFY rk <= 5
    """,
)
def cooks_distance_daily_trend(spark, sf_dir):
    """COOK'S DISTANCE influence diagnostics on the daily-revenue ~
    day-index OLS fit — the top-5 most influential days, the
    regression-diagnostics sibling of the Grubbs outlier row
    (Grubbs asks 'is the extreme value surprising'; Cook asks 'how
    much does this point BEND the fitted line'):
    Dᵢ = uᵢ²/(p·s²) · hᵢ/(1−hᵢ)² with p = 2, s² = SSE/(n−2) and
    leverage hᵢ = 1/n + (i−ī)²/Sᵢᵢ.  Coefficients from exact
    integer/decimal sums; per-row residual and leverage are
    identical double expressions; D is rounded to 8 dp BEFORE the
    ranking so the top-5 cut is ULP-stable, with the day as the
    total tie-break (§7.3-H7).  Scale: day-dictionary-tier; the
    coefficient and SSE scalars ride broadcast cross joins; the
    top-5 is a TakeOrdered, never a full sort at scale."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).cast("bigint").alias("cents"))
    idx = daily.select(
        "d", "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint")
        .alias("i"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = idx.agg(
        F.count("*").alias("n"),
        F.sum("i").cast("bigint").alias("st"),
        F.sum(F.col("i") * F.col("i")).cast("bigint").alias("stt"),
        F.sum(dec("cents")).cast("double").alias("sy"),
        F.sum(F.col("i") * dec("cents")).cast("double").alias("sty"))
    coef = (tot.filter(F.expr(
        "n >= 3 AND n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st "
        "> 0"))
        .select(
            "n", "st", "stt",
            F.expr("(n * sty - st * sy) / (n * CAST(stt AS DOUBLE) "
                   "- CAST(st AS DOUBLE) * st)").alias("b"),
            F.expr("(sy - (n * sty - st * sy) "
                   "/ (n * CAST(stt AS DOUBLE) "
                   "- CAST(st AS DOUBLE) * st) * st) / n").alias("a")))
    resid = (idx.crossJoin(F.broadcast(coef))
             .select("d", "cents", "i", "n", "st", "stt",
                     F.expr("CAST(cents AS DOUBLE) - a - b * i")
                     .alias("u")))
    s = resid.agg(F.count("*").alias("n2"),
                  F.sum(F.expr("u * u")).alias("sse"))
    hd = (resid.filter(F.expr(
        "n >= 4 AND CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n "
        "> 0"))
        .select("d", "cents", "u", F.expr(
            "1.0 / n + (i - CAST(st AS DOUBLE) / n) "
            "* (i - CAST(st AS DOUBLE) / n) "
            "/ (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)")
            .alias("h")))
    dk = (hd.crossJoin(F.broadcast(s))
          .filter(F.expr("sse > 0"))
          .select("d", "cents",
                  F.expr("round(u * u / (2.0 * (sse / (n2 - 2))) "
                         "* h / ((1 - h) * (1 - h)), 8)")
                  .alias("cooks_d"),
                  F.expr("round(h, 6)").alias("leverage")))
    w = Window.orderBy(F.desc("cooks_d"), F.asc("d"))
    return (
        dk.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("rk", F.col("d").alias("day"), "cents", "cooks_d",
                "leverage")
    )


@query(
    "cronbach_alpha_quality_gates",
    "analytics/stats",
    oracle="""
    WITH rated AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS x1,
               CASE WHEN len(string_split(text, ' ')) >= 40
                    THEN 1 ELSE 0 END AS x2,
               CASE WHEN n_chars >= 4 * len(string_split(text, ' '))
                    THEN 1 ELSE 0 END AS x3
        FROM documents
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS y1,
               CAST(sum(x2) AS BIGINT) AS y2,
               CAST(sum(x3) AS BIGINT) AS y3,
               CAST(sum(x1 + x2 + x3) AS BIGINT) AS st,
               CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT)
                   AS sq
        FROM rated
    )
    SELECT n, y1, y2, y3,
           round(1.5 * (1.0
                 - ((CAST(y1 AS DOUBLE) / n - (CAST(y1 AS DOUBLE) / n)
                       * (CAST(y1 AS DOUBLE) / n))
                    + (CAST(y2 AS DOUBLE) / n - (CAST(y2 AS DOUBLE) / n)
                       * (CAST(y2 AS DOUBLE) / n))
                    + (CAST(y3 AS DOUBLE) / n - (CAST(y3 AS DOUBLE) / n)
                       * (CAST(y3 AS DOUBLE) / n)))
                   / (CAST(sq AS DOUBLE) / n - (CAST(st AS DOUBLE) / n)
                      * (CAST(st AS DOUBLE) / n))), 6) AS alpha
    FROM s
    WHERE n >= 2
      AND CAST(sq AS DOUBLE) / n - (CAST(st AS DOUBLE) / n)
          * (CAST(st AS DOUBLE) / n) > 0
    """,
)
def cronbach_alpha_quality_gates(spark, sf_dir):
    """CRONBACH'S ALPHA internal-consistency coefficient over the
    three binary document-quality gates (the same three 'raters' the
    Fleiss-kappa row scores — kappa asks 'do they agree beyond
    chance', alpha asks 'do they measure one construct'):
    α = k/(k−1)·(1 − Σσᵢ²/σ_total²) with k = 3, population
    variances, all from five exact BIGINT sufficient statistics
    (n, three item sums — binary items square to themselves — and
    the total-score sum/sum-of-squares).  One conditional-aggregate
    pass, dictionary-tier; the degenerate zero-total-variance corpus
    is excluded by an identical guard."""
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    x1 = (F.col("n_chars") >= 200).cast("int")
    x2 = (ntok >= 40).cast("int")
    x3 = (F.col("n_chars") >= 4 * ntok).cast("int")
    t = x1 + x2 + x3
    s = d.select(x1.alias("x1"), x2.alias("x2"), x3.alias("x3"),
                 t.alias("t")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("y1"),
        F.sum("x2").cast("bigint").alias("y2"),
        F.sum("x3").cast("bigint").alias("y3"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sq"))
    item_var = " + ".join(
        f"(CAST(y{i} AS DOUBLE) / n - (CAST(y{i} AS DOUBLE) / n) "
        f"* (CAST(y{i} AS DOUBLE) / n))" for i in (1, 2, 3))
    tot_var = ("CAST(sq AS DOUBLE) / n - (CAST(st AS DOUBLE) / n) "
               "* (CAST(st AS DOUBLE) / n)")
    return (
        s.filter(F.expr(f"n >= 2 AND {tot_var} > 0"))
        .select("n", "y1", "y2", "y3",
                F.expr(f"round(1.5 * (1.0 - ({item_var}) "
                       f"/ ({tot_var})), 6)").alias("alpha"))
    )


@query(
    "krippendorff_alpha_quality_gates",
    "analytics/stats",
    oracle="""
    WITH rated AS (
        SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 40
                       THEN 1 ELSE 0 END
                + CASE WHEN n_chars >= 4 * len(string_split(text, ' '))
                       THEN 1 ELSE 0 END) AS n1
        FROM documents
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n1) AS BIGINT) AS y,
               CAST(sum(n1 * (3 - n1)) AS BIGINT) AS dis
        FROM rated
    )
    SELECT n, y, dis,
           round(1.0 - CAST(dis AS DOUBLE) * (3 * n - 1)
                 / (2.0 * y * (3 * n - y)), 6) AS alpha
    FROM s
    WHERE n >= 2 AND y > 0 AND y < 3 * n
    """,
)
def krippendorff_alpha_quality_gates(spark, sf_dir):
    """KRIPPENDORFF'S ALPHA (nominal metric, binary categories,
    m = 3 raters, no missing values) over the same three quality
    gates — the agreement coefficient that, unlike Fleiss' kappa,
    corrects chance agreement with the FINITE-sample coincidence
    denominator (T−1): from the coincidence-matrix derivation the
    whole statistic collapses to
    α = 1 − [Σᵤ n1ᵤ(m−n1ᵤ)]·(T−1) / (2·y·(T−y)) with T = 3n and
    y the total yes-count — three BIGINT sufficient statistics, one
    double expression, 6 dp (pytest cross-checks the collapsed form
    against a generic coincidence-matrix reference).  The unanimous
    corpus (D_e = 0) is excluded by an identical guard.
    Dictionary-tier: one conditional-aggregate pass."""
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    n1 = ((F.col("n_chars") >= 200).cast("int")
          + (ntok >= 40).cast("int")
          + (F.col("n_chars") >= 4 * ntok).cast("int"))
    s = d.select(n1.alias("n1")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n1").cast("bigint").alias("y"),
        F.sum(F.col("n1") * (3 - F.col("n1"))).cast("bigint")
        .alias("dis"))
    return (
        s.filter(F.expr("n >= 2 AND y > 0 AND y < 3 * n"))
        .select("n", "y", "dis",
                F.expr("round(1.0 - CAST(dis AS DOUBLE) * (3 * n - 1) "
                       "/ (2.0 * y * (3 * n - y)), 6)").alias("alpha"))
    )


@query(
    "simpson_diversity_tokens_by_lang",
    "analytics/text",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), tf AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY lang, tok
    ), s AS (
        SELECT lang,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(c * (c - 1)) AS BIGINT) AS coll
        FROM tf GROUP BY lang
    )
    SELECT lang, n_tokens, n_types,
           round(1.0 - CAST(coll AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
               AS simpson_d
    FROM s WHERE n_tokens >= 2
    """,
)
def simpson_diversity_tokens_by_lang(spark, sf_dir):
    """SIMPSON'S DIVERSITY INDEX of the token distribution per
    language — the concentration-side complement of the Shannon
    entropy and Yule's-K rows (Simpson's D is the probability two
    randomly drawn tokens differ; Yule's K is a rescaling of its
    complement, so the pair cross-checks): D = 1 − Σc(c−1)/(N(N−1))
    from exact BIGINT collision counts over the per-(lang, token)
    frequency table.  Scale: one explode + two hash aggs, shuffled
    on (lang, token) then lang — the vocabulary table is the big
    intermediate and it partial-aggregates map-side."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("lang", "tok").agg(
        F.count("*").cast("bigint").alias("c"))
    s = tf.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint")
        .alias("coll"))
    return (
        s.filter(F.col("n_tokens") >= 2)
        .select("lang", "n_tokens", "n_types",
                F.expr("round(1.0 - CAST(coll AS DOUBLE) "
                       "/ (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)),"
                       " 6)").alias("simpson_d"))
    )


@query(
    "oov_rate_by_source",
    "LLM-pipeline",
    oracle="""
    WITH train_vocab AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 10 < 8
    ), vsz AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM train_vocab
    ), eval_toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 10 >= 8
    ), s AS (
        SELECT e.source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM eval_toks e LEFT JOIN train_vocab v ON e.tok = v.tok
        GROUP BY e.source
    )
    SELECT source, n_tokens, n_oov,
           round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate,
           vocab_size
    FROM s, vsz WHERE n_tokens > 0
    """,
)
def oov_rate_by_source(spark, sf_dir):
    """OUT-OF-VOCABULARY accounting for a train/eval split — the
    tokenizer-coverage check every pretraining pipeline runs before
    freezing a vocabulary: the vocab is the distinct token set of
    the TRAIN split (doc_id % 10 < 8), and each source's EVAL-split
    token stream is scored for tokens the vocab misses.  Exact
    integer counts; the rate is one rounded ratio.  Scale: the
    vocab is vocabulary-sized, so the membership probe is a
    broadcast LEFT join (no shuffle of the eval stream); the
    vocab-size scalar rides a broadcast cross join."""
    d = table(spark, sf_dir, "documents")
    vocab = (d.filter(F.col("doc_id") % 10 < 8)
             .select(F.explode(F.split("text", " ")).alias("tok"))
             .distinct())
    vsz = vocab.agg(F.count("*").cast("bigint").alias("vocab_size"))
    ev = (d.filter(F.col("doc_id") % 10 >= 8)
          .select("source",
                  F.explode(F.split("text", " ")).alias("tok")))
    s = (ev.join(F.broadcast(vocab.withColumn("_in", F.lit(1))),
                 "tok", "left")
         .groupBy("source")
         .agg(F.count("*").cast("bigint").alias("n_tokens"),
              F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
              .cast("bigint").alias("n_oov")))
    return (
        s.crossJoin(F.broadcast(vsz))
        .filter(F.col("n_tokens") > 0)
        .select("source", "n_tokens", "n_oov",
                F.expr("round(CAST(n_oov AS DOUBLE) / n_tokens, 6)")
                .alias("oov_rate"),
                "vocab_size")
    )


@query(
    "pii_redaction_stats",
    "LLM-pipeline",
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call 555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                    4, '0')
                       ELSE '' END AS text2
        FROM documents
    ), scored AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text2, '[a-z0-9]+@example\\.com')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(
                   text2, '555-[0-9]{4}')) AS BIGINT) AS n_phone,
               CAST(length(text2) AS BIGINT)
               - CAST(length(regexp_replace(regexp_replace(
                     text2, '[a-z0-9]+@example\\.com', '[EMAIL]', 'g'),
                     '555-[0-9]{4}', '[PHONE]', 'g')) AS BIGINT)
                   AS bytes_removed
        FROM planted
    )
    SELECT CAST(n_email AS BIGINT) AS emails_in_doc,
           CAST(n_phone AS BIGINT) AS phones_in_doc,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bytes_removed) AS BIGINT) AS bytes_removed
    FROM scored
    GROUP BY n_email, n_phone
    """,
)
def pii_redaction_stats(spark, sf_dir):
    """PII REDACTION — the scrubbing pass a training-data pipeline
    runs before anything ships: synthetic emails and phone numbers
    are PLANTED deterministically (docs ≡0 mod 5 get an email,
    ≡0 mod 7 a 555-prefixed phone), then regex redaction rewrites
    them to [EMAIL]/[PHONE] placeholders.  The hashed census groups
    documents by (emails found, phones found) and sums the exact
    byte delta of the rewrite — a missed plant, a false positive on
    clean text, or a non-global replace (first-match-only is the
    classic bug) each shifts a group or the byte count.  Patterns
    stay in the RE2 ∩ Java-regex common dialect so both engines
    match identically.  Scale: pure per-row codegen string work —
    no shuffle until the dictionary-sized census rollup."""
    d = table(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" call 555-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"),
                               4, "0"))).otherwise(F.lit("")))
    email_re = "[a-z0-9]+@example\\.com"
    phone_re = "555-[0-9]{4}"
    planted = d.select("doc_id", text2.alias("text2"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text2"), email_re, "[EMAIL]"),
        phone_re, "[PHONE]")
    scored = planted.select(
        F.size(F.regexp_extract_all("text2", F.lit(email_re), F.lit(0)))
        .cast("bigint").alias("n_email"),
        F.size(F.regexp_extract_all("text2", F.lit(phone_re), F.lit(0)))
        .cast("bigint").alias("n_phone"),
        (F.length("text2") - F.length(clean)).cast("bigint")
        .alias("bytes_removed"))
    return (
        scored.groupBy(F.col("n_email").alias("emails_in_doc"),
                       F.col("n_phone").alias("phones_in_doc"))
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("bytes_removed").cast("bigint").alias("bytes_removed"))
    )


@query(
    "hnsw_knn_recall_verified",
    "LLM-pipeline",
    oracle="""
    WITH q AS (
        SELECT embedding AS qe,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS qq
        FROM embeddings WHERE vec_id = 0
    ), sims AS (
        SELECT e.vec_id,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x, unnest(q.qe) AS y))
                 AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS dd,
               q.qq AS qq
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, round(dot / (sqrt(dd) * sqrt(qq)), 4) AS sim,
           TRUE AS quality_ok
    FROM sims
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def hnsw_knn_recall_verified(spark, sf_dir):
    """GRAPH-ANN tier (r15 VERDICT "What's missing" #5 — the
    recall-at-low-latency point-lookup shape IVF/PQ/SQ8/BQ don't
    cover): a navigable-small-world beam search in the sharded-DiskANN
    dataflow — hash-shard the corpus, build a per-shard NSW graph
    inside one Arrow task (operators/similarity.nsw_topk; single-layer
    HNSW core, Malkov & Yashunin 2016), beam-search the broadcast
    query per shard, TakeOrdered-merge the shard candidates.  Per
    query that is O(shards * ef * log n) distance evals, not O(N).
    Verification follows the ``ivf_kmeans_recall_verified`` pattern:
    the hashed output is the EXACT brute-force cosine top-10 (the
    oracle-able half); the graph path's quality rides ``quality_ok``
    — true iff the NSW top-10's summed similarity reaches 85 % of the
    exact top-10's (measured 0.96+ recall@10 at ef=48 on
    unit-sphere fixtures, the hardest case; the in-process pytest
    additionally proves beam-with-ef=n == exhaustive, i.e. the
    insertion graph stays connected)."""
    from ..operators import similarity as sim_ops
    from .llm_vector import cosine_scored

    exact = (
        cosine_scored(spark, sf_dir)
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )
    e = table(spark, sf_dir, "embeddings")
    approx = sim_ops.nsw_topk(
        e, query_id=0, k=10, m=8, ef_construction=48, ef_search=48,
        shards=4,
    )
    mass = (
        approx.agg(F.sum("sim").alias("ann_mass"))
        .crossJoin(exact.agg(F.sum("sim").alias("exact_mass")))
    )
    return exact.crossJoin(F.broadcast(mass)).select(
        "vec_id",
        "sim",
        (F.col("ann_mass") >= 0.85 * F.col("exact_mass")).alias("quality_ok"),
    )


@query(
    "gwet_ac1_quality_raters",
    "analytics/stats",
    oracle="""
    WITH rated AS (
        SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 40
                       THEN 1 ELSE 0 END
                + CASE WHEN n_chars >= 4 * len(string_split(text, ' '))
                       THEN 1 ELSE 0 END) AS n1
        FROM documents
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n1) AS BIGINT) AS y_total,
               CAST(sum(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT)
                   AS sq_total
        FROM rated
    )
    SELECT n_docs, y_total, sq_total,
           round(((CAST(sq_total AS DOUBLE) - 3.0 * n_docs)
                    / (6.0 * n_docs)
                  - 2.0 * (CAST(y_total AS DOUBLE) / (3.0 * n_docs))
                        * (1.0 - CAST(y_total AS DOUBLE) / (3.0 * n_docs)))
                 / (1.0
                    - 2.0 * (CAST(y_total AS DOUBLE) / (3.0 * n_docs))
                          * (1.0 - CAST(y_total AS DOUBLE)
                             / (3.0 * n_docs))), 6) AS ac1
    FROM s
    WHERE n_docs >= 1
    """,
)
def gwet_ac1_quality_raters(spark, sf_dir):
    """GWET'S AC1 across the same three document-quality raters as the
    Fleiss row (char gate, token gate, avg-word-length gate) —
    completing the graded agreement family (Cohen pairwise, Fleiss
    multi-rater, Krippendorff coincidence-matrix, now the
    paradox-resistant AC1).  Same observed agreement P̄ as Fleiss from
    the exact integer sufficient statistics (N, Σn₁, Σsquares); the
    chance term is Gwet's 2π(1−π) with π the pooled yes-rate, which
    is ≤ 1/2 — so UNLIKE kappa the denominator never degenerates and
    the unanimous-corpus guard disappears (that robustness to
    prevalence extremes is exactly why AC1 exists).  One
    conditional-aggregate pass — dictionary-tier at any corpus
    size."""
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    n1 = ((F.col("n_chars") >= 200).cast("int")
          + (ntok >= 40).cast("int")
          + (F.col("n_chars") >= 4 * ntok).cast("int"))
    s = d.select(n1.alias("n1")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n1").cast("bigint").alias("y_total"),
        F.sum(F.col("n1") * F.col("n1")
              + (3 - F.col("n1")) * (3 - F.col("n1")))
        .cast("bigint").alias("sq_total"),
    )
    nD = F.col("n_docs").cast("double")
    p = F.col("y_total").cast("double") / (3.0 * nD)
    pbar = (F.col("sq_total").cast("double") - 3.0 * nD) / (6.0 * nD)
    pe = 2.0 * p * (1.0 - p)
    return s.filter(F.col("n_docs") >= 1).select(
        "n_docs", "y_total", "sq_total",
        F.round((pbar - pe) / (1.0 - pe), 6).alias("ac1"),
    )


@query(
    "dunn_posthoc_priority_value",
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
    ), tot AS (
        SELECT CAST(sum(nj) AS BIGINT) AS n FROM grp
    )
    SELECT a.g AS g1, b.g AS g2,
           a.nj AS n1, b.nj AS n2,
           round((CAST(a.s2 AS DOUBLE) / (2.0 * a.nj)
                  - CAST(b.s2 AS DOUBLE) / (2.0 * b.nj))
                 / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12.0
                         - (SELECT tsum FROM ties) / (12.0 * (n - 1)))
                        * (1.0 / a.nj + 1.0 / b.nj)), 4) AS z
    FROM grp a JOIN grp b ON a.g < b.g
    CROSS JOIN tot
    WHERE n >= 3
      AND (SELECT tsum FROM ties)
          < CAST(n AS DOUBLE) * n * n - n
    ORDER BY g1, g2
    """,
)
def dunn_posthoc_priority_value(spark, sf_dir):
    """DUNN'S POST-HOC TEST after the graded Kruskal-Wallis row — the
    nonparametric counterpart of the round-16 Tukey HSD pair: for
    each of the 10 priority pairs, z = (R̄ᵢ − R̄ⱼ) / √((N(N+1)/12 −
    Σ(t³−t)/(12(N−1))) · (1/nᵢ + 1/nⱼ)), with the tie-corrected
    pooled-rank variance.  Reuses the KW machinery exactly: midranks
    stay EXACT integers via the doubling trick (2·midrank = 2·rank +
    tiesize − 1), per-group rank sums ride DECIMAL(38,0), the tie
    cubic rides DECIMAL, and each z is ONE token-identical double
    expression rounded 4 dp.  Guards mirror KW (N ≥ 3, non-degenerate
    tie term).  Scale: one global rank, then a 5-row dictionary
    self-join — the pairwise frame never touches the fact tier."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    x = o.select(F.col("o_orderpriority").alias("g"),
                 F.floor(F.col("o_totalprice") * 100)
                 .cast("bigint").alias("v"))
    r2 = (
        2 * F.rank().over(Window.orderBy("v"))
        + F.count("*").over(Window.partitionBy("v")).cast("bigint") - 1
    )
    ranked = x.select("g", r2.alias("r2"))
    grp = ranked.groupBy("g").agg(
        F.count("*").cast("bigint").alias("nj"),
        F.sum(F.col("r2").cast("decimal(38,0)")).alias("s2"),
    )
    ties = (
        x.groupBy("v").agg(F.count("*").cast("bigint").alias("t"))
        .agg(F.sum(F.col("t").cast("decimal(38,0)")
                   * F.col("t").cast("decimal(38,0)") * F.col("t")
                   - F.col("t")).cast("double").alias("tsum"))
    )
    tot = grp.agg(F.sum("nj").cast("bigint").alias("n"))
    a = grp.select(F.col("g").alias("g1"), F.col("nj").alias("n1"),
                   F.col("s2").alias("s2a"))
    b = grp.select(F.col("g").alias("g2"), F.col("nj").alias("n2"),
                   F.col("s2").alias("s2b"))
    pairs = (
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .filter((F.col("n") >= 3)
                & (F.col("tsum")
                   < F.col("n").cast("double") * F.col("n") * F.col("n")
                   - F.col("n")))
    )
    z = (
        (F.col("s2a").cast("double") / (2.0 * F.col("n1"))
         - F.col("s2b").cast("double") / (2.0 * F.col("n2")))
        / F.sqrt((F.col("n").cast("double") * (F.col("n") + 1) / 12.0
                  - F.col("tsum") / (12.0 * (F.col("n") - 1)))
                 * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    )
    return (
        pairs.select("g1", "g2", "n1", "n2", F.round(z, 4).alias("z"))
        .orderBy("g1", "g2")
    )


@query(
    "page_trend_test_priority_year",
    "analytics/stats",
    oracle="""
    WITH cells AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS j,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY 1, 2
    ), full_blocks AS (
        SELECT yr FROM cells GROUP BY yr HAVING count(*) = 5
    ), ranked AS (
        SELECT c.yr, c.j,
               CAST(row_number() OVER (PARTITION BY c.yr
                                       ORDER BY c.cents, c.j) AS BIGINT)
                   AS r
        FROM cells c JOIN full_blocks f ON c.yr = f.yr
    ), s AS (
        SELECT CAST(count(DISTINCT yr) AS BIGINT) AS m,
               CAST(sum(j * r) AS BIGINT) AS l_stat
        FROM ranked
    )
    SELECT m AS n_blocks, l_stat,
           round((CAST(l_stat AS DOUBLE) - 45.0 * m)
                 / (5.0 * sqrt(CAST(m AS DOUBLE))), 4) AS z
    FROM s WHERE m >= 1
    """,
)
def page_trend_test_priority_year(spark, sf_dir):
    """PAGE'S TREND TEST (the ordered-alternative counterpart of the
    graded Friedman/Kendall-W blocked-rank rows): blocks = order
    years, treatments = the five priorities in their numeric order
    (1-URGENT … 5-LOW), cell metric = exact yearly revenue cents per
    priority.  Within each complete block the five cells are ranked
    (row_number over (cents, j) — cents ties, astronomically unlikely
    across ~10^5 summed orders, break deterministically by treatment
    index on BOTH engines), and L = Σ j·Rⱼ.  For k=5 the null moments
    collapse to E[L] = 45m and Var[L] = 25m, so z = (L − 45m)/(5√m)
    is one double expression over two exact integers.  Blocks missing
    a priority are excluded by an identical HAVING on both engines.
    Scale: cells is a 35-row dictionary after one fact aggregate."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"),
                  F.substring("o_orderpriority", 1, 1)
                  .cast("bigint").alias("j"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
             .cast("bigint").alias("cents"))
    )
    full_blocks = cells.groupBy("yr").agg(
        F.count("*").alias("k")).filter(F.col("k") == 5).select("yr")
    ranked = (
        cells.join(F.broadcast(full_blocks), "yr")
        .select("yr", "j",
                F.row_number().over(
                    Window.partitionBy("yr").orderBy("cents", "j"))
                .cast("bigint").alias("r"))
    )
    s = ranked.agg(
        F.countDistinct("yr").cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("r")).cast("bigint").alias("l_stat"),
    )
    return s.filter(F.col("m") >= 1).select(
        F.col("m").alias("n_blocks"), "l_stat",
        F.round((F.col("l_stat").cast("double") - 45.0 * F.col("m"))
                / (5.0 * F.sqrt(F.col("m").cast("double"))), 4).alias("z"),
    )


@query(
    "anderson_darling_k_sample",
    "analytics/stats",
    oracle="""
    WITH x AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT v) AS BIGINT) AS nd,
               CAST(count(DISTINCT lang) AS BIGINT) AS k
        FROM x
    ), vals AS (
        SELECT v, CAST(count(*) AS BIGINT) AS l FROM x GROUP BY v
    ), valsb AS (
        SELECT v, l,
               2 * CAST(sum(l) OVER (ORDER BY v) AS BIGINT) - l AS b
        FROM vals
    ), langs AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS ni FROM x GROUP BY lang
    ), grid AS (
        SELECT g.lang, g.ni, vb.v, vb.l, vb.b,
               COALESCE(li.lij, 0) AS lij
        FROM valsb vb CROSS JOIN langs g
        LEFT JOIN (SELECT lang, v, CAST(count(*) AS BIGINT) AS lij
                   FROM x GROUP BY lang, v) li
          ON li.lang = g.lang AND li.v = vb.v
    ), cum AS (
        SELECT lang, ni, l, b,
               2 * CAST(sum(lij) OVER (PARTITION BY lang ORDER BY v)
                        AS BIGINT) - lij AS m
        FROM grid
    ), inner_sum AS (
        SELECT sum(CAST(l AS DOUBLE)
                   * CAST(t.n * c.m - c.ni * c.b AS DOUBLE)
                   * CAST(t.n * c.m - c.ni * c.b AS DOUBLE)
                   / (CAST(c.ni AS DOUBLE) * t.n
                      * (c.b * (2 * t.n - c.b) - t.n * c.l))) AS s
        FROM cum c CROSS JOIN tot t
    )
    SELECT k AS n_samples, n AS n_total,
           round((CAST(n AS DOUBLE) - 1) / n * (SELECT s FROM inner_sum),
                 4) AS a2_stat
    FROM tot
    WHERE k >= 2 AND n >= 2 AND nd >= 2
    """,
)
def anderson_darling_k_sample(spark, sf_dir):
    """K-SAMPLE ANDERSON-DARLING (Scholz & Stephens 1987, the
    ties-adjusted A²akN form) across the five languages on document
    length — the tail-weighted companion of the graded
    Cramér-von-Mises two-sample row (AD up-weights distribution
    tails, which is where corpus-length drift shows first).  The
    midrank machinery stays EXACT by the doubling trick: 2B_j and
    2M_ij are integers off two cumulative windows over the
    value-dictionary grid (every (lang, value) cell INCLUDING zero
    cells — the statistic needs M_ij even where sample i has no mass
    at z_j), the per-cell term l·(N·m − nᵢ·b)²/(nᵢ·N·(b(2N−b) − N·l))
    is all-integer up to one double division, and the type-tier
    double sum (~5·|distinct| terms, error ~1e-12) is four orders
    under the 4-dp round — the bigram-perplexity precedent.  The
    denominator b(2N−b) − N·l ≥ l(N−l) > 0 whenever there are ≥ 2
    distinct values (guarded identically on both engines).  Scale:
    after one fact aggregate everything is dictionary-tier; at 100 TB
    the value dictionary is the two-pass exact-order-statistics
    shape, and the bigint products move to DECIMAL."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    x = d.select("lang", F.col("n_chars").cast("bigint").alias("v"))
    tot = x.agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("v").cast("bigint").alias("nd"),
        F.countDistinct("lang").cast("bigint").alias("k"),
    )
    vals = x.groupBy("v").agg(F.count("*").cast("bigint").alias("l"))
    valsb = vals.select(
        "v", "l",
        (2 * F.sum("l").over(
            Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0))
         .cast("bigint") - F.col("l")).alias("b"),
    )
    langs = x.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("ni"))
    li = x.groupBy("lang", "v").agg(
        F.count("*").cast("bigint").alias("lij"))
    grid = (
        valsb.crossJoin(F.broadcast(langs))
        .join(li, ["lang", "v"], "left")
        .select("lang", "ni", "v", "l", "b",
                F.coalesce(F.col("lij"), F.lit(0)).alias("lij"))
    )
    cum = grid.select(
        "lang", "ni", "l", "b",
        (2 * F.sum("lij").over(
            Window.partitionBy("lang").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0))
         .cast("bigint") - F.col("lij")).alias("m"),
    )
    nm = F.col("n") * F.col("m") - F.col("ni") * F.col("b")
    inner = (
        cum.crossJoin(F.broadcast(tot))
        .agg(F.sum(
            F.col("l").cast("double")
            * nm.cast("double") * nm.cast("double")
            / (F.col("ni").cast("double") * F.col("n")
               * (F.col("b") * (2 * F.col("n") - F.col("b"))
                  - F.col("n") * F.col("l")))).alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(inner))
        .filter((F.col("k") >= 2) & (F.col("n") >= 2)
                & (F.col("nd") >= 2))
        .select(
            F.col("k").alias("n_samples"), F.col("n").alias("n_total"),
            F.round((F.col("n").cast("double") - 1) / F.col("n")
                    * F.col("s"), 4).alias("a2_stat"),
        )
    )


@query(
    "jackknife_loo_ratio_by_year",
    "analytics/stats",
    oracle="""
    WITH rows_x AS (
        SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS y,
               CAST(floor(l_quantity * 100) AS BIGINT) AS q
        FROM lineitem
    ), per AS (
        SELECT yr, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(q) AS BIGINT) AS sq
        FROM rows_x GROUP BY yr
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS g,
               CAST(sum(sy) AS BIGINT) AS ty,
               CAST(sum(sq) AS BIGINT) AS tq
        FROM per
    )
    SELECT yr, n_rows,
           round(CAST(ty - sy AS DOUBLE) / (tq - sq), 6) AS theta_loo,
           round(g * (CAST(ty AS DOUBLE) / tq)
                 - (g - 1) * (CAST(ty - sy AS DOUBLE) / (tq - sq)), 6)
               AS pseudo_value
    FROM per CROSS JOIN tot
    WHERE g >= 2 AND tq - sq > 0 AND tq > 0
    ORDER BY yr
    """,
)
def jackknife_loo_ratio_by_year(spark, sf_dir):
    """DELETE-ONE-GROUP JACKKNIFE sensitivity table for the ratio
    estimator revenue-per-unit = Σprice/Σquantity over lineitem,
    deleting one ship-year at a time — the resampling companion of
    the graded bootstrap-CI row, and the standard robustness check
    a metrics pipeline runs on any ratio KPI (ratio estimators are
    biased; the jackknife pseudo-values θ·g − (g−1)·θ₍ g₎ expose both
    the bias direction and which period drives it).  Every
    leave-one-out ratio is a SINGLE division of two exact bigint
    cents/centi-unit sums (no per-row resampling — the algebraic
    identity θ₍g₎ = (Ty−Syg)/(Tq−Sqg) collapses the resample to the
    per-group sufficient statistics), rounded 6 dp.  Scale: one fact
    aggregate to ~7 year rows, then dictionary math — the jackknife
    never re-reads the corpus."""
    li = table(spark, sf_dir, "lineitem")
    rows_x = li.select(
        F.year("l_shipdate").cast("bigint").alias("yr"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        F.floor(F.col("l_quantity") * 100).cast("bigint").alias("q"),
    )
    per = rows_x.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("q").cast("bigint").alias("sq"),
    )
    tot = per.agg(
        F.count("*").cast("bigint").alias("g"),
        F.sum("sy").cast("bigint").alias("ty"),
        F.sum("sq").cast("bigint").alias("tq"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .filter((F.col("g") >= 2) & (F.col("tq") - F.col("sq") > 0)
                & (F.col("tq") > 0))
        .select(
            "yr", "n_rows",
            F.round((F.col("ty") - F.col("sy")).cast("double")
                    / (F.col("tq") - F.col("sq")), 6).alias("theta_loo"),
            F.round(F.col("g") * (F.col("ty").cast("double") / F.col("tq"))
                    - (F.col("g") - 1)
                    * ((F.col("ty") - F.col("sy")).cast("double")
                       / (F.col("tq") - F.col("sq"))), 6)
            .alias("pseudo_value"),
        )
        .orderBy("yr")
    )


@query(
    "dsir_importance_topk",
    "LLM-pipeline",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), tf AS (
        SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2, 3
    ), tw AS (
        SELECT tok, CAST(sum(tf) AS BIGINT) AS t
        FROM tf WHERE lang = 'en' GROUP BY tok
    ), cw AS (
        SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY tok
    ), consts AS (
        SELECT (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS ctot,
               (SELECT CAST(sum(tf) AS BIGINT) FROM tf
                WHERE lang = 'en') AS ttot,
               (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM tf) AS v
    ), scored AS (
        SELECT f.doc_id, f.lang,
               CAST(sum(f.tf) AS BIGINT) AS n_tok,
               sum(f.tf * (ln(COALESCE(tw.t, 0) + 1) - ln(cw.c + 1)))
                   AS s0
        FROM tf f
        LEFT JOIN tw ON f.tok = tw.tok
        JOIN cw ON f.tok = cw.tok
        GROUP BY 1, 2
    ), final AS (
        SELECT doc_id, lang, n_tok,
               round(s0 + n_tok * (ln(ctot + v) - ln(ttot + v)), 4)
                   AS score
        FROM scored CROSS JOIN consts
        WHERE ttot > 0 AND ctot > 0
    ), ranked AS (
        SELECT doc_id, lang, n_tok, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rn
        FROM final
    )
    SELECT doc_id, lang, n_tok, score, rn FROM ranked WHERE rn <= 20
    """,
)
def dsir_importance_topk(spark, sf_dir):
    """DSIR-STYLE IMPORTANCE SELECTION (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — the
    standard pretraining data-selection recipe): score every corpus
    document by the log importance ratio between an add-one-smoothed
    unigram model of the TARGET domain (here: the 'en' slice) and one
    of the RAW corpus, and keep the top-20 budget.  score(d) =
    Σ_types tf·(ln(t_w+1) − ln(c_w+1)) + |d|·(ln(C+V) − ln(T+V)) —
    the per-type counts are exact integers, the constant smoothing
    masses fold into one closed term, and the per-doc type-tier log
    sum (~10²  terms, error ~1e-13) is rounded to 4 dp BEFORE the
    ranking so the kept set is decided by a pinned value with a
    doc_id tie-break (§7.3-H2/H7, the tfidf precedent).  Scale: the
    two count tables are vocabulary-sized broadcasts; one shuffle on
    tok, one on doc_id — the exact DSIR plan at 100 TB (the paper's
    hashed-feature variant only shrinks V; the dataflow is this)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang",
                    F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count("*").cast("bigint").alias("tf"))
    tw = (tf.filter(F.col("lang") == "en").groupBy("tok")
          .agg(F.sum("tf").cast("bigint").alias("t")))
    cw = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("c"))
    consts = tf.agg(
        F.sum("tf").cast("bigint").alias("ctot"),
        F.sum(F.when(F.col("lang") == "en", F.col("tf")))
        .cast("bigint").alias("ttot"),
        F.countDistinct("tok").cast("bigint").alias("v"),
    )
    scored = (
        tf.join(F.broadcast(tw), "tok", "left")
        .join(F.broadcast(cw), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            F.sum(F.col("tf")
                  * (F.log(F.coalesce(F.col("t"), F.lit(0)) + 1)
                     - F.log(F.col("c") + 1))).alias("s0"),
        )
    )
    final = (
        scored.crossJoin(F.broadcast(consts))
        .filter((F.col("ttot") > 0) & (F.col("ctot") > 0))
        .select(
            "doc_id", "lang", "n_tok",
            F.round(F.col("s0")
                    + F.col("n_tok")
                    * (F.log(F.col("ctot") + F.col("v"))
                       - F.log(F.col("ttot") + F.col("v"))), 4)
            .alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        final.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "n_tok", "score", "rn")
    )


@query(
    "link_prediction_resource_allocation",
    "LLM-pipeline/graph",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id
    ), cand AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), edges AS (
        SELECT d1, d2
        FROM cand p
        JOIN sizes s1 ON p.d1 = s1.doc_id
        JOIN sizes s2 ON p.d2 = s2.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (s1.sz + s2.sz - p.inter) >= 0.8
    ), adj AS (
        SELECT d1 AS node, d2 AS nbr FROM edges
        UNION ALL SELECT d2, d1 FROM edges
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY node
    ), smallw AS (
        SELECT a.node, a.nbr, d.deg
        FROM adj a JOIN deg d ON a.nbr = d.node
        WHERE d.deg <= 64
    ), wedge AS (
        SELECT a.node AS u, b.node AS v, a.deg AS wdeg
        FROM smallw a JOIN smallw b
          ON a.nbr = b.nbr AND a.node < b.node
    ), nonadj AS (
        SELECT wd.u, wd.v,
               CAST(count(*) AS BIGINT) AS cn,
               round(sum(1.0 / wd.wdeg), 6) AS ra
        FROM wedge wd
        WHERE NOT EXISTS (SELECT 1 FROM edges e
                          WHERE e.d1 = wd.u AND e.d2 = wd.v)
        GROUP BY 1, 2
    ), ranked AS (
        SELECT u AS doc_a, v AS doc_b, cn, ra,
               CAST(row_number() OVER (ORDER BY cn DESC, ra DESC,
                                       u, v) AS BIGINT) AS rn
        FROM nonadj
    )
    SELECT doc_a, doc_b, cn, ra, rn FROM ranked WHERE rn <= 20
    """,
)
def link_prediction_resource_allocation(spark, sf_dir):
    """LINK PREDICTION over the near-dup graph via the
    RESOURCE-ALLOCATION index (Zhou, Lü & Zhang 2009) with
    common-neighbor count as the primary key — in a dedup pipeline
    the top predicted links are exactly the borderline duplicate
    pairs the 0.8 threshold missed but transitivity exposes (both
    docs near-dup a common witness), i.e. the review queue a corpus
    curator audits.  Reuses the content-addressed edge snapshot
    (near_dup_edges, built once per corpus); RA(u,v) =
    Σ_{w∈N(u)∩N(v), deg(w)≤64, (u,v)∉E} 1/deg(w).  The witness
    degree cap is LOAD-BEARING, not an optimization flag: the wedge
    fan-out is Σ_w deg(w)², and this fixture's mega near-dup clique
    (deg ≈ 300 at sf0.01, thousands at sf0.1) makes the uncapped
    wedge tier quadratic in clique size — measured OOM at sf0.1.
    Capping the WITNESS (the standard hub filter; each dropped
    witness contributed ≤ 1/64 anyway, and a mega-clique witness
    carries no discriminative signal) bounds the fan-out at
    64·Σdeg = 128·|E|, linear in edges at any corpus size.  Ranking
    is decided by the exact bigint common-neighbor count first, the
    6-dp-rounded RA second, and the pair ids last (§7.3-H7)."""
    from .llm_text import near_dup_edges

    edges = near_dup_edges(spark, sf_dir)
    adj = edges.select(F.col("d1").alias("node"), F.col("d2").alias("nbr")) \
        .unionAll(edges.select(F.col("d2").alias("node"),
                               F.col("d1").alias("nbr")))
    deg = adj.groupBy("node").agg(
        F.count("*").cast("bigint").alias("deg"))
    smallw = (
        adj.join(F.broadcast(
            deg.filter(F.col("deg") <= 64)
            .select(F.col("node").alias("nbr"), "deg")), "nbr")
    )
    a = smallw.select(F.col("node").alias("u"), F.col("nbr").alias("w"),
                      F.col("deg").alias("wdeg"))
    b = smallw.select(F.col("node").alias("v"), F.col("nbr").alias("w"))
    wedge = a.join(b, "w").filter(F.col("u") < F.col("v"))
    nonadj = (
        wedge.join(
            edges,
            (wedge["u"] == edges["d1"]) & (wedge["v"] == edges["d2"]),
            "left_anti",
        )
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.round(F.sum(1.0 / F.col("wdeg")), 6).alias("ra"),
        )
    )
    from pyspark.sql import Window

    rk = Window.orderBy(F.desc("cn"), F.desc("ra"), F.asc("u"), F.asc("v"))
    return (
        nonadj.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= 20)
        .select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b"),
                "cn", "ra", "rn")
    )


@query(
    "mmr_diversify_rerank_verified",
    "LLM-pipeline",
    oracle="""
    WITH q AS (
        SELECT embedding AS qe,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS qq
        FROM embeddings WHERE vec_id = 0
    ), sims AS (
        SELECT e.vec_id,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x, unnest(q.qe) AS y))
                 AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS dd,
               q.qq AS qq
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, round(dot / (sqrt(dd) * sqrt(qq)), 4) AS sim,
           TRUE AS mmr_ok
    FROM sims
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def mmr_diversify_rerank_verified(spark, sf_dir):
    """MAXIMAL MARGINAL RELEVANCE diversified reranking (Carbonell &
    Goldstein 1998 — the standard diversification pass every RAG
    retriever runs on its shortlist): take the relevance top-12 for
    query vec_id=0, greedily select 5 maximizing λ·rel(d) −
    (1−λ)·max_{s∈S} sim(d,s) with λ=0.7.  The greedy loop runs on
    the DRIVER over the 12 collected shortlist vectors (the
    production shape — rerankers operate on shortlists, never the
    corpus; same bounded-collect envelope as bq_topk's query row),
    but its claim is verified DISTRIBUTEDLY: for each step the
    Spark-side receipt recomputes every remaining candidate's MMR
    objective with JVM cosine expressions and checks the pick
    attains the maximum; ``mmr_ok`` is the conjunction.  As with the
    ANN recall rows, the HASHED output is the oracle-able exact
    relevance top-10; the MMR selection's correctness rides the
    boolean.  Scale: the corpus-wide stage is the exact top-k scan
    (TakeOrderedAndProject); everything after is shortlist-sized."""
    import numpy as np

    from ..operators.similarity import cosine as _cos
    from .llm_vector import cosine_scored

    exact = (
        cosine_scored(spark, sf_dir)
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "sim")
    )
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    shortlist = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding",
                F.round(_cos(F.col("embedding"), F.col("qe")), 4)
                .alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(12)
    )
    rows = shortlist.collect()  # bounded: 12 rows by construction
    lam, k_sel = 0.7, 5
    if len(rows) == 0:
        return exact.withColumn("mmr_ok", F.lit(True)).limit(0)
    ids = [int(r.vec_id) for r in rows]
    X = np.array([[float(v) for v in r.embedding] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rel = {int(r.vec_id): float(r.rel) for r in rows}
    from ..operators.similarity import mmr_greedy

    sel = mmr_greedy(ids, Xn, rel, lam, k_sel)
    # distributed receipts: one tiny frame per step, unioned
    cand = shortlist.select("vec_id", "embedding", "rel")
    checks = None
    for t in range(len(sel)):
        prior, pick = sel[:t], sel[t]
        rem = cand.filter(~F.col("vec_id").isin(sel[:t]))
        if prior:
            pr = cand.filter(F.col("vec_id").isin(prior)).select(
                F.col("embedding").alias("emb2"))
            pen = (
                rem.crossJoin(F.broadcast(pr))
                .groupBy("vec_id", "rel")
                .agg(F.max(_cos(F.col("embedding"), F.col("emb2")))
                     .alias("pen"))
            )
        else:
            pen = rem.select("vec_id", "rel", F.lit(0.0).alias("pen"))
        obj = pen.select(
            "vec_id",
            (lam * F.col("rel") - (1 - lam) * F.col("pen")).alias("obj"))
        step = obj.agg(
            (F.max(F.when(F.col("vec_id") == pick, F.col("obj")))
             >= F.max("obj") - 1e-9).alias("ok"))
        checks = step if checks is None else checks.unionAll(step)
    ok = checks.agg(
        F.coalesce(F.bool_and("ok"), F.lit(False)).alias("mmr_ok"))
    return exact.crossJoin(F.broadcast(ok)).select(
        "vec_id", "sim", "mmr_ok")


@query(
    "cochran_armitage_trend_urgent",
    "analytics/stats",
    oracle="""
    WITH per AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS a
        FROM orders GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(a) AS BIGINT) AS aa,
               CAST(sum(s * a) AS BIGINT) AS sa,
               CAST(sum(s * n) AS BIGINT) AS sn,
               CAST(sum(n * s * s) AS BIGINT) AS snn
        FROM per
    )
    SELECT k AS n_years, nn AS n_total, aa AS n_urgent,
           round((CAST(nn AS DOUBLE) * sa - CAST(aa AS DOUBLE) * sn)
                 / sqrt(CAST(aa AS DOUBLE) * (nn - aa)
                        * (CAST(nn AS DOUBLE) * snn
                           - CAST(sn AS DOUBLE) * sn) / nn), 4) AS z
    FROM agg
    WHERE k >= 2 AND nn >= 2 AND aa > 0 AND aa < nn
      AND CAST(nn AS DOUBLE) * snn - CAST(sn AS DOUBLE) * sn > 0
    """,
)
def cochran_armitage_trend_urgent(spark, sf_dir):
    """COCHRAN-ARMITAGE TREND TEST for the urgent-order proportion
    across order years (scores = the years themselves; the statistic
    is invariant to affine score shifts, so raw years ≡ 0..k−1) —
    the dose-response rung between the graded two-proportion-z row
    (2 groups) and chi-square independence (unordered).  z = (N·Σsa
    − A·Σsn) / √(A(N−A)(N·Σns² − (Σns)²)/N): all six sufficient
    statistics are exact bigints off ONE aggregate over the 7-row
    year dictionary, the polynomial products stay inside bigint at
    any SF that fits bigint counts, and z is one token-identical
    double expression rounded 4 dp.  Degenerate guards (one year,
    all/no urgent, zero score variance) are identical on both
    engines."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("s")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
        .cast("bigint").alias("a"),
    )
    agg = per.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("a").cast("bigint").alias("aa"),
        F.sum(F.col("s") * F.col("a")).cast("bigint").alias("sa"),
        F.sum(F.col("s") * F.col("n")).cast("bigint").alias("sn"),
        F.sum(F.col("n") * F.col("s") * F.col("s"))
        .cast("bigint").alias("snn"),
    )
    nn_d = F.col("nn").cast("double")
    var_s = nn_d * F.col("snn") - F.col("sn").cast("double") * F.col("sn")
    return (
        agg.filter((F.col("k") >= 2) & (F.col("nn") >= 2)
                   & (F.col("aa") > 0) & (F.col("aa") < F.col("nn"))
                   & (var_s > 0))
        .select(
            F.col("k").alias("n_years"), F.col("nn").alias("n_total"),
            F.col("aa").alias("n_urgent"),
            F.round((nn_d * F.col("sa")
                     - F.col("aa").cast("double") * F.col("sn"))
                    / F.sqrt(F.col("aa").cast("double")
                             * (F.col("nn") - F.col("aa"))
                             * var_s / F.col("nn")), 4).alias("z"),
        )
    )


@query(
    "mantel_haenszel_urgent_highvalue",
    "analytics/stats",
    oracle="""
    WITH cells AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(sum(CASE WHEN o_totalprice >= 150000
                             AND o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN o_totalprice >= 150000
                             AND o_orderpriority <> '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN o_totalprice < 150000
                             AND o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN o_totalprice < 150000
                             AND o_orderpriority <> '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM orders GROUP BY 1
    ), terms AS (
        SELECT yr, a, b, c, d, a + b + c + d AS n,
               CAST(a * d AS DECIMAL(38,6)) / (a + b + c + d) AS ad_n,
               CAST(b * c AS DECIMAL(38,6)) / (a + b + c + d) AS bc_n,
               CAST((a + b) * (a + c) AS DECIMAL(38,6))
                   / (a + b + c + d) AS e_a,
               CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c)
                    * (b + d) AS DECIMAL(38,6))
                   / (CAST(a + b + c + d AS BIGINT)
                      * (a + b + c + d) * (a + b + c + d - 1)) AS v_a
        FROM cells
        WHERE a + b + c + d >= 2
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(ad_n) AS DOUBLE) AS s_ad,
               CAST(sum(bc_n) AS DOUBLE) AS s_bc,
               CAST(sum(a) AS DOUBLE) AS s_a,
               CAST(sum(e_a) AS DOUBLE) AS s_e,
               CAST(sum(v_a) AS DOUBLE) AS s_v
        FROM terms
    )
    SELECT n_strata,
           round(s_ad / s_bc, 4) AS or_mh,
           round((s_a - s_e) / sqrt(s_v), 4) AS z_cmh
    FROM s
    WHERE s_bc > 0 AND s_v > 0
    """,
)
def mantel_haenszel_urgent_highvalue(spark, sf_dir):
    """MANTEL-HAENSZEL common odds ratio + the (signed, uncorrected)
    Cochran-Mantel-Haenszel statistic for urgent-priority ×
    high-value (≥ 150k) orders STRATIFIED BY YEAR — the
    confounder-adjusted rung above the graded single-table
    odds-ratio row (year is the classic confounder: both margins
    drift with time).  Every per-stratum term (ad/n, bc/n, the
    hypergeometric mean (a+b)(a+c)/n and variance
    (a+b)(c+d)(a+c)(b+d)/(n²(n−1))) is ONE decimal division of exact
    bigint cell products at a pinned 6-dp scale (the KW/decimal
    precedent — deterministic on both engines), summed exactly as
    DECIMAL over the 7-row stratum dictionary; OR_MH = Σ(ad/n)/Σ(bc/n)
    and z = (Σa − ΣE)/√ΣV finish as double expressions rounded 4 dp.
    Guards: ≥ 2 rows per kept stratum, Σbc/n > 0, ΣV > 0."""
    o = table(spark, sf_dir, "orders")
    hv = F.col("o_totalprice") >= 150000
    ur = F.col("o_orderpriority") == "1-URGENT"
    cells = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")).agg(
        F.sum((hv & ur).cast("int")).cast("bigint").alias("a"),
        F.sum((hv & ~ur).cast("int")).cast("bigint").alias("b"),
        F.sum((~hv & ur).cast("int")).cast("bigint").alias("c"),
        F.sum((~hv & ~ur).cast("int")).cast("bigint").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.filter(n >= 2).select(
        "a",
        ((F.col("a") * F.col("d")).cast("decimal(38,6)") / n).alias("ad_n"),
        ((F.col("b") * F.col("c")).cast("decimal(38,6)") / n).alias("bc_n"),
        (((F.col("a") + F.col("b")) * (F.col("a") + F.col("c")))
         .cast("decimal(38,6)") / n).alias("e_a"),
        (((F.col("a") + F.col("b")).cast("decimal(38,0)")
          * (F.col("c") + F.col("d")) * (F.col("a") + F.col("c"))
          * (F.col("b") + F.col("d"))).cast("decimal(38,6)")
         / (n.cast("bigint") * n * (n - 1))).alias("v_a"),
    )
    s = terms.agg(
        F.count("*").cast("bigint").alias("n_strata"),
        F.sum("ad_n").cast("double").alias("s_ad"),
        F.sum("bc_n").cast("double").alias("s_bc"),
        F.sum("a").cast("double").alias("s_a"),
        F.sum("e_a").cast("double").alias("s_e"),
        F.sum("v_a").cast("double").alias("s_v"),
    )
    return (
        s.filter((F.col("s_bc") > 0) & (F.col("s_v") > 0))
        .select(
            "n_strata",
            F.round(F.col("s_ad") / F.col("s_bc"), 4).alias("or_mh"),
            F.round((F.col("s_a") - F.col("s_e"))
                    / F.sqrt(F.col("s_v")), 4).alias("z_cmh"),
        )
    )


@query(
    "mood_median_test_segments",
    "analytics/stats",
    oracle="""
    WITH x AS (
        SELECT c_mktsegment AS g,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM x
    ), med AS (
        SELECT v AS m FROM (
            SELECT v, row_number() OVER (ORDER BY v) AS rn FROM x
        ) r CROSS JOIN tot WHERE r.rn = (tot.n + 1) // 2
    ), per AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(CASE WHEN v > (SELECT m FROM med)
                             THEN 1 ELSE 0 END) AS BIGINT) AS ag
        FROM x GROUP BY g
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(ag) AS BIGINT) AS a
        FROM per
    )
    SELECT k AS n_groups, n AS n_total, a AS n_above,
           round((SELECT sum(
               (ag - ng * (CAST(a AS DOUBLE) / n))
               * (ag - ng * (CAST(a AS DOUBLE) / n))
               / (ng * (CAST(a AS DOUBLE) / n))
               + ((ng - ag) - ng * (CAST(n - a AS DOUBLE) / n))
               * ((ng - ag) - ng * (CAST(n - a AS DOUBLE) / n))
               / (ng * (CAST(n - a AS DOUBLE) / n))
           ) FROM per CROSS JOIN s), 4) AS chi2
    FROM s
    WHERE k >= 2 AND a > 0 AND a < n
    """,
)
def mood_median_test_segments(spark, sf_dir):
    """MOOD'S MEDIAN TEST across the five market segments on customer
    account balance — the robust quick-screen companion of the graded
    Kruskal-Wallis row (KW uses full rank information; Mood's test
    only asks which side of the GRAND median each observation falls,
    making it insensitive to outliers and the textbook k-sample
    location screen).  The grand median is the exact ⌊(N+1)/2⌋-th
    order statistic (one global rank — the two-pass ranged sort at
    100 TB), above-counts are exact bigints, and the k×2 chi-square
    Σ(o−e)²/e collapses to a 5-term double sum (error ~1e-15) rounded
    4 dp.  Degenerate guards (k < 2, nobody/everybody above the
    median) match on both engines."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    x = c.select(F.col("c_mktsegment").alias("g"),
                 F.floor(F.col("c_acctbal") * 100)
                 .cast("bigint").alias("v"))
    tot = x.agg(F.count("*").cast("bigint").alias("n"))
    ranked = x.select(
        "v", F.row_number().over(Window.orderBy("v")).alias("rn"))
    med = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("v").alias("m"))
    )
    per = (
        x.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(F.count("*").cast("bigint").alias("ng"),
             F.sum((F.col("v") > F.col("m")).cast("int"))
             .cast("bigint").alias("ag"))
    )
    s = per.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("ag").cast("bigint").alias("a"),
    )
    pa = F.col("a").cast("double") / F.col("n")
    pb = (F.col("n") - F.col("a")).cast("double") / F.col("n")
    chi = per.crossJoin(F.broadcast(s)).agg(F.sum(
        (F.col("ag") - F.col("ng") * pa) * (F.col("ag") - F.col("ng") * pa)
        / (F.col("ng") * pa)
        + ((F.col("ng") - F.col("ag")) - F.col("ng") * pb)
        * ((F.col("ng") - F.col("ag")) - F.col("ng") * pb)
        / (F.col("ng") * pb)).alias("chi2raw"))
    return (
        s.crossJoin(F.broadcast(chi))
        .filter((F.col("k") >= 2) & (F.col("a") > 0)
                & (F.col("a") < F.col("n")))
        .select(F.col("k").alias("n_groups"), F.col("n").alias("n_total"),
                F.col("a").alias("n_above"),
                F.round(F.col("chi2raw"), 4).alias("chi2"))
    )


@query(
    "hodges_lehmann_shift_doc_lengths",
    "analytics/stats",
    oracle="""
    WITH a AS (
        SELECT CAST(n_chars AS BIGINT) AS x FROM documents
        WHERE lang = 'en'
    ), b AS (
        SELECT CAST(n_chars AS BIGINT) AS y FROM documents
        WHERE lang = 'de'
    ), counts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM b) AS n2
    ), diffs AS (
        SELECT a.x - b.y AS d FROM a CROSS JOIN b
    ), ranked AS (
        SELECT d, row_number() OVER (ORDER BY d) AS rn FROM diffs
    )
    SELECT counts.n1, counts.n2,
           round((
               (SELECT CAST(d AS DOUBLE) FROM ranked r
                CROSS JOIN counts c
                WHERE r.rn = (c.n1 * c.n2 + 1) // 2)
               + (SELECT CAST(d AS DOUBLE) FROM ranked r
                  CROSS JOIN counts c
                  WHERE r.rn = (c.n1 * c.n2 + 2) // 2)
           ) / 2, 1) AS hl_shift
    FROM counts
    WHERE n1 >= 1 AND n2 >= 1
    """,
)
def hodges_lehmann_shift_doc_lengths(spark, sf_dir):
    """HODGES-LEHMANN SHIFT ESTIMATOR between 'en' and 'de' document
    lengths — the robust location-difference companion of the graded
    Mann-Whitney row (MW answers "is there a shift?"; HL answers "by
    how much": the median of all n₁·n₂ pairwise differences, the
    estimator whose CI inverts the MW test).  The pairwise-difference
    relation is materialized (~10⁶ rows at sf0.1 — two ~10³ slices),
    the two middle order statistics come off one global rank, and HL
    is their exact .5-rational mean (integer inputs — no FP before
    the final halving).  At 100 TB one does NOT materialize the
    quadratic pair set: HL is found by binary-searching the shift t
    while COUNTING pairs with x−y ≤ t (two sorted slices, a merge
    per probe — O((n₁+n₂)log range)); the fixture-scale join states
    the semantics the search must reproduce."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    a = d.filter(F.col("lang") == "en").select(
        F.col("n_chars").cast("bigint").alias("x"))
    b = d.filter(F.col("lang") == "de").select(
        F.col("n_chars").cast("bigint").alias("y"))
    counts = (
        a.agg(F.count("*").cast("bigint").alias("n1"))
        .crossJoin(b.agg(F.count("*").cast("bigint").alias("n2")))
    )
    diffs = a.crossJoin(b).select((F.col("x") - F.col("y")).alias("d"))
    ranked = diffs.select(
        "d", F.row_number().over(Window.orderBy("d")).alias("rn"))
    lo = (
        ranked.crossJoin(F.broadcast(counts))
        .filter(F.col("rn")
                == F.floor((F.col("n1") * F.col("n2") + 1) / 2))
        .select(F.col("d").alias("d_lo"))
    )
    hi = (
        ranked.crossJoin(F.broadcast(counts))
        .filter(F.col("rn")
                == F.floor((F.col("n1") * F.col("n2") + 2) / 2))
        .select(F.col("d").alias("d_hi"))
    )
    return (
        counts.filter((F.col("n1") >= 1) & (F.col("n2") >= 1))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select("n1", "n2",
                F.round((F.col("d_lo").cast("double")
                         + F.col("d_hi")) / 2, 1).alias("hl_shift"))
    )
