"""Extension aggregation queries (beyond SURVEY §2.B #5-13):
pivot/unpivot, statistical suites, FILTER clauses, min_by/max_by,
percentiles, time rollups, and NULL/mode semantics."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_pivot",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot status values into columns (BigQuery-class reshaping)."""
    o = table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


@query(
    "agg_stats_suite",
    "aggregation",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_suite(spark, sf_dir):
    """Statistical aggregates (stddev/corr/covar), rounded — the two
    engines use different variance algorithms (§7.3-H2)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@query(
    "agg_min_max_by",
    "aggregation",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark, sf_dir):
    """max_by/min_by (argmax aggregates).  Deterministic because
    o_totalprice values are unique within a customer in the fixtures."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_percentile_median",
    "aggregation",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_median(spark, sf_dir):
    """Exact interpolated percentiles: Spark ``percentile`` ≙ DuckDB
    ``quantile_cont`` (both linear interpolation; probed MATCH)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        F.count("*").alias("cnt"),
    )


@query(
    "agg_conditional_bools",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'F') AS any_f,
           bool_and(o_totalprice > 0) AS all_positive
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional_bools(spark, sf_dir):
    """Conditional/boolean aggregates: ``count_if`` (oracle spelled as
    the SUM-CASE it is defined as, avoiding DuckDB version drift),
    ``bool_or``/``bool_and``."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


@query(
    "agg_filter_clause",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000),
                 4) AS big_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark, sf_dir):
    """Per-aggregate FILTER clauses — several differently-filtered
    aggregates in ONE pass over the data (no self-join, no union)."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000),
                     4) AS big_total
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_time_rollup",
    "grouping sets",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           count(*) AS cnt,
           CAST(grouping(year(o_orderdate)) AS INT) AS gy,
           CAST(grouping(month(o_orderdate)) AS INT) AS gm
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                     month(o_orderdate))
    """,
)
def agg_time_rollup(spark, sf_dir):
    """ROLLUP over derived time-hierarchy EXPRESSIONS (year→quarter→
    month) with grouping() markers — the calendar drill-down cube;
    complements the plain-column rollup #10."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(month(o_orderdate) AS INT) AS m,
               count(*) AS cnt,
               CAST(grouping(year(o_orderdate)) AS INT) AS gy,
               CAST(grouping(month(o_orderdate)) AS INT) AS gm
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                         month(o_orderdate))
        """
    )


@query(
    "agg_collect_distinct_sorted",
    "array agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list_distinct(
               list(substring(n_name, 1, 8)))), ',') AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_distinct_sorted(spark, sf_dir):
    """Distinct ordered list aggregation compared as a joined string
    (#42's discipline: DuckDB 1.0 rejects ORDER BY inside aggregate
    args, so sorting happens post-hoc on both sides)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(
            ",",
            F.sort_array(F.array_distinct(
                F.collect_list(F.substring("n_name", 1, 8))))
        ).alias("names")
    )


@query(
    "agg_null_semantics",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_nonopen,
           round(avg(CASE WHEN o_orderstatus <> 'O'
                          THEN o_totalprice END), 4) AS avg_nonopen_price,
           CAST(min(nullif(o_orderstatus, 'O')) IS NULL AS BOOLEAN)
               AS all_null_group
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_null_semantics(spark, sf_dir):
    """NULL aggregation semantics pinned down: count(col) skips NULLs,
    avg ignores NULLs (not zero-fills), min of an all-NULL group is
    NULL — identical in both engines, asserted per group."""
    o = table(spark, sf_dir, "orders")
    nonopen = F.nullif("o_orderstatus", F.lit("O"))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count(nonopen).alias("n_nonopen"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") != "O",
                         F.col("o_totalprice"))), 4
        ).alias("avg_nonopen_price"),
        F.min(nonopen).isNull().alias("all_null_group"),
    )


@query(
    "agg_mode_deterministic",
    "aggregation",
    oracle="""
    WITH counts AS (
        SELECT lang, source, count(*) AS cnt
        FROM documents GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, source, cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, source ASC) AS rn
        FROM counts
    )
    SELECT lang, source AS mode_source, cnt AS mode_cnt
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark, sf_dir):
    """Statistical mode per group with a total-order tie-break — both
    engines' native ``mode()`` breaks ties arbitrarily (§7.3-H7), so
    the engine states it as count → rank → rn=1, which also scales
    better: the count aggregate collapses cardinality before the tiny
    per-group window."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("source"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("mode_source"),
                F.col("cnt").alias("mode_cnt"))
    )


@query(
    "unpivot_measures",
    "reshape",
    oracle="""
    SELECT * FROM (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice, l_discount, l_tax
        FROM lineitem WHERE l_orderkey < 1000
    ) UNPIVOT (val FOR measure IN (l_extendedprice, l_discount, l_tax))
    """,
)
def unpivot_measures(spark, sf_dir):
    """Wide→long reshape (UNPIVOT ≙ ``DataFrame.unpivot``); the inverse
    of agg_pivot.  Both engines drop NULL measure values by default."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_discount", "l_tax",
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "winsorized_price_stats",
    "aggregation/robust",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(o_totalprice, 0.01) AS lo,
               quantile_cont(o_totalprice, 0.99) AS hi
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(least(greatest(o_totalprice, b.lo), b.hi)
                              AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS winsorized_sum
    FROM orders, bounds b
    GROUP BY o_orderstatus
    """,
)
def winsorized_price_stats(spark, sf_dir):
    """Winsorized aggregation: clip prices at the corpus p01/p99 before
    summing — the outlier-robust statistic quality dashboards run.
    The two quantiles ride a 1-row broadcast (exact percentile here;
    approx_percentile is the drop-in at 100 TB); the clipped sum is
    decimal-pinned on both engines."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile("o_totalprice", 0.01).alias("lo"),
        F.percentile("o_totalprice", 0.99).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(clipped.cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("winsorized_sum"),
        )
    )


@query(
    "median_absolute_deviation",
    "aggregation/robust",
    oracle="""
    WITH med AS (
        SELECT quantile_cont(o_totalprice, 0.5) AS m FROM orders
    )
    SELECT round(CAST((SELECT m FROM med) AS DOUBLE), 4) AS median_price,
           round(quantile_cont(abs(o_totalprice - (SELECT m FROM med)),
                               0.5), 4) AS mad
    FROM orders
    """,
)
def median_absolute_deviation(spark, sf_dir):
    """MAD — the robust spread statistic (median of |x - median|):
    two percentile passes, the first riding a 1-row broadcast into the
    second.  The robust alternative to stddev for outlier-heavy
    monetary columns; swap percentile → approx_percentile at 100 TB."""
    o = table(spark, sf_dir, "orders")
    med = o.agg(F.percentile("o_totalprice", 0.5).alias("m"))
    return (
        o.crossJoin(F.broadcast(med))
        .agg(
            F.round(F.first("m"), 4).alias("median_price"),
            F.round(
                F.percentile(F.abs(F.col("o_totalprice") - F.col("m")), 0.5), 4
            ).alias("mad"),
        )
    )


@query(
    "histogram_equi_depth",
    "aggregation/robust",
    oracle="""
    WITH t AS (
        SELECT o_totalprice,
               ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY bucket
    """,
)
def histogram_equi_depth(spark, sf_dir):
    """Equi-DEPTH histogram: ntile(8) over the price order (ties broken
    on the key so both engines assign identically) — equal-count
    buckets with their value ranges, the summary statistics a CBO or
    data-profiler collects.  Complements fn_width_bucket's equi-WIDTH
    histogram.

    Scale shape (round-4 VERDICT watch-list item): a bare
    ``ntile(8) OVER (ORDER BY ...)`` funnels every row through one
    task.  Computed instead as the two-pass range-partitioned global
    row_number (``ranged_row_number``) plus the integer-exact ntile
    arithmetic from the broadcast total count — identical bucket
    assignment, no single-partition stage."""
    from ..operators.scale import ntile_from_row_number, ranged_row_number

    o = table(spark, sf_dir, "orders")
    cnt = o.agg(F.count("*").alias("__n"))
    t = (
        ranged_row_number(
            o.select("o_totalprice", "o_orderkey"),
            [F.asc("o_totalprice"), F.asc("o_orderkey")],
            "__rn",
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            "o_totalprice",
            ntile_from_row_number(F.col("__rn"), F.col("__n"), 8).alias(
                "bucket"
            ),
        )
    )
    return t.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "regression_price_trend",
    "aggregation/ml",
    oracle="""
    SELECT o_orderstatus,
           round(regr_slope(o_totalprice,
                 date_diff('day', DATE '1970-01-01',
                           o_orderdate::TIMESTAMP::DATE)), 6) AS slope,
           round(regr_intercept(o_totalprice,
                 date_diff('day', DATE '1970-01-01',
                           o_orderdate::TIMESTAMP::DATE)), 2) AS icept,
           round(regr_r2(o_totalprice,
                 date_diff('day', DATE '1970-01-01',
                           o_orderdate::TIMESTAMP::DATE)), 6) AS r2,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def regression_price_trend(spark, sf_dir):
    """Per-group ordinary-least-squares price trend: slope, intercept,
    and R² of totalprice over epoch day via the SQL-standard regr_*
    aggregates — a one-pass distributive model fit (each aggregate is
    sums/products under the hood, so it partial-aggregates map-side
    like any sum).  The grouped-ML shape that needs no Python: fitting
    a line per segment over 100 TB is one shuffle of 6 running sums
    per group.  Probed cross-engine: identical to 6 dp."""
    o = table(spark, sf_dir, "orders")
    x = F.unix_date(F.to_date("o_orderdate"))
    y = F.col("o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.count("*").alias("n"),
    )


@query(
    "median_exact_scalable",
    "aggregation/robust",
    oracle="""
    SELECT round(median(o_totalprice), 4) AS median_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    """,
)
def median_exact_scalable(spark, sf_dir):
    """EXACT global median — the textbook 'impossible at scale' scalar —
    via the two-pass range-partitioned row_number: select the one or
    two middle positions of the total order and average them.  No task
    ever holds more than its range slice; the selection itself is a
    filter on the global row number.  (percentile()/approx_percentile
    remain the single-window and sketch alternatives; this is the exact
    distributed form.)  Positions: (n+1) div 2 and (n+2) div 2 —
    identical for odd n; DuckDB's median() interpolates the same two
    middle values for even n."""
    from ..operators.scale import ranged_row_number

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    cnt = o.agg(F.count("*").alias("__n"))
    rn = ranged_row_number(
        o, [F.asc("o_totalprice"), F.asc("o_orderkey")], "__rn"
    ).crossJoin(F.broadcast(cnt))
    p1 = ((F.col("__n") + 1) / 2).cast("long")
    p2 = ((F.col("__n") + 2) / 2).cast("long")
    return (
        rn.filter((F.col("__rn") == p1) | (F.col("__rn") == p2))
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("median_price"),
            # empty input: the oracle's count(*) is 0, not NULL
            F.coalesce(F.first("__n"), F.lit(0).cast("long")).alias("n"),
        )
    )


@query(
    "percentiles_exact_scalable",
    "aggregation/robust",
    oracle="""
    WITH r AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
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
                          THEN o_totalprice END), 2) AS p90
    FROM r
    """,
)
def percentiles_exact_scalable(spark, sf_dir):
    """EXACT nearest-rank percentile vector (p25/p50/p75/p90) in one
    distributed pass over the total order: two-pass range-partitioned
    row_number, filter to the four target ranks (ceil(p*n)), collapse
    with conditional aggregation.  The definition is pinned by explicit
    rank selection on BOTH engines (not each engine's quantile_*
    flavor, which disagree on interpolation).  Generalizes
    median_exact_scalable to any quantile vector; the sketch
    alternative (approx_percentile) trades exactness for one fewer
    shuffle."""
    from ..operators.scale import ranged_row_number

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    cnt = o.agg(F.count("*").alias("__n"))
    rn = ranged_row_number(
        o, [F.asc("o_totalprice"), F.asc("o_orderkey")], "__rn"
    ).crossJoin(F.broadcast(cnt))
    pos = lambda p: F.ceil(F.lit(p) * F.col("__n")).cast("long")  # noqa: E731
    targets = rn.filter(
        (F.col("__rn") == pos(0.25))
        | (F.col("__rn") == pos(0.50))
        | (F.col("__rn") == pos(0.75))
        | (F.col("__rn") == pos(0.90))
    )
    pick = lambda p: F.round(  # noqa: E731
        F.max(
            F.when(F.col("__rn") == pos(p), F.col("o_totalprice"))
        ), 2
    )
    return targets.agg(
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
        pick(0.90).alias("p90"),
    )


@query(
    "approx_quantile_error_audit",
    "approx agg/audit",
    oracle="""
    SELECT CAST(0.25 AS DOUBLE) AS quantile,
           round(quantile_cont(o_totalprice, 0.25), 2) AS exact_value,
           TRUE AS rel_error_ok FROM orders HAVING count(*) > 0
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), round(quantile_cont(o_totalprice, 0.5), 2), TRUE
    FROM orders HAVING count(*) > 0
    UNION ALL
    SELECT CAST(0.75 AS DOUBLE), round(quantile_cont(o_totalprice, 0.75), 2), TRUE
    FROM orders HAVING count(*) > 0
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE), round(quantile_cont(o_totalprice, 0.9), 2), TRUE
    FROM orders HAVING count(*) > 0
    """,
)
def approx_quantile_error_audit(spark, sf_dir):
    """Accuracy audit for the sketch quantiles a 100 TB deploy uses in
    place of the exact two-pass operator: one row per quantile with
    the sketch estimate, the exact value, and absolute/relative error.
    The deploy rule this measures: approx_percentile(acc=10000) must
    sit within ~1e-4 rank error — pytest pins relative value error
    < 1% on the fixture distribution, so a silent accuracy regression
    (Spark upgrade, accuracy-knob typo) fails fast.  One pass for all
    four sketch quantiles + one exact percentile pass; both
    partial-aggregate map-side."""
    o = table(spark, sf_dir, "orders")
    qs = [0.25, 0.5, 0.75, 0.9]
    approx = o.agg(
        F.percentile_approx("o_totalprice", qs, 10000).alias("ap")
    )
    exact = o.agg(F.percentile("o_totalprice", qs).alias("ex"))
    both = approx.crossJoin(exact).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("ap"),
                F.col("ex"),
            )
        ).alias("z")
    ).select(
        F.col("z.q").alias("quantile"),
        F.col("z.ap").alias("ap"),
        F.round("z.ex", 2).alias("exact_value"),
        F.col("z.ex").alias("ex_raw"),
    )
    # PROMOTED round 13 from rows-only (r12 VERDICT task 8, the
    # hll_error_audit pattern): the sketch ESTIMATE stays out of the
    # hashed output — DuckDB cannot replay the GK sketch — and the
    # accuracy contract lands as a graded boolean instead.
    return both.select(
        "quantile", "exact_value",
        (F.abs(F.col("ap") - F.col("ex_raw"))
         <= 0.01 * F.abs(F.col("ex_raw"))).alias("rel_error_ok"),
    )


@query(
    "hll_error_audit",
    "approx agg/audit",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS error_ok
    FROM events
    GROUP BY event_type
    """,
)
def hll_error_audit(spark, sf_dir):
    """Accuracy audit for HLL++ distinct counting — the estimator that
    replaces exact count(DISTINCT) at 100 TB (fixed 1.5 KB of state
    per group vs an unbounded distinct-set shuffle).  PROMOTED round
    13 from rows-only to oracle-checked sketch-verify (r12 VERDICT
    task 8 — the ``approx_count_distinct`` precedent): DuckDB cannot
    replay Spark's HLL++ registers, so the sketch ESTIMATE stays out
    of the hashed output; what the driver grades is the EXACT
    per-type distinct count (restated by plain SQL) plus ``error_ok``
    — the estimate within 5x the requested rsd of the exact count for
    EVERY group, so an accuracy regression in the sketch (a Spark
    upgrade, a silently changed rsd knob) flips a graded boolean.
    The pytest audit keeps the raw per-group error surface."""
    # r16 optimization (guide §2.3 — aggregate before you shuffle):
    # countDistinct + approx_count_distinct in ONE aggregate planned as
    # an Expand (2x rows) whose hash-agg buffer carries the rsd-0.01
    # HLL++ register array as 1641 separate long columns PER GROUP PER
    # PARTITION through the whole pipeline.  Deduplicating
    # (event_type, user_id) first partial-aggregates map-side with a
    # 2-column buffer; the sketch then runs over distinct pairs only —
    # HLL registers are max-of-hash, so duplicates never change them
    # and the estimate (hence error_ok) is bit-identical; the exact
    # count is count() of the deduped non-null pairs.
    e = table(spark, sf_dir, "events")
    pairs = e.select("event_type", "user_id").distinct()
    per = (
        pairs.groupBy("event_type")
        .agg(
            F.count("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        )
    )
    return per.select(
        "event_type", "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 5 * 0.01 * F.col("exact_users")
        ).alias("error_ok"),
    )


@query(
    "dq_distribution_drift_psi",
    "aggregation/quality",
    oracle="""
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 8)
                   AS bin,
               CASE WHEN o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
                    THEN 1 ELSE 0 END AS is_ref
        FROM orders
    ), per_bin AS (
        SELECT bin,
               CAST(sum(is_ref) AS BIGINT) AS ref_n,
               CAST(sum(1 - is_ref) AS BIGINT) AS cur_n
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT sum(ref_n) AS ref_t, sum(cur_n) AS cur_t,
               count(*) AS n_bins
        FROM per_bin
    )
    SELECT bin, ref_n, cur_n,
           round(
               (CAST(cur_n + 1 AS DOUBLE) / (cur_t + n_bins)
                - CAST(ref_n + 1 AS DOUBLE) / (ref_t + n_bins))
               * ln((CAST(cur_n + 1 AS DOUBLE) / (cur_t + n_bins))
                    / (CAST(ref_n + 1 AS DOUBLE) / (ref_t + n_bins))),
               6) AS psi_term
    FROM per_bin, tot
    """,
)
def dq_distribution_drift_psi(spark, sf_dir):
    """Distribution-drift monitoring: the population stability index
    (PSI) of the order-price distribution, current period vs reference
    period — the observability check a pipeline runs on every new
    snapshot to catch silent upstream shifts before they poison
    training data.  Per fixed-width price bin: reference and current
    counts plus the Laplace-smoothed PSI term ((p_cur - p_ref) *
    ln(p_cur / p_ref)); the consumer sums terms and alerts over ~0.2.

    Scale shape: ONE pass — the bin and period are per-row
    expressions, the groupBy partial-aggregates map-side into at most
    9 x 2 cells per partition, and the totals ride a broadcast 1-row
    frame.  Drift-checking 100 TB costs a single scan.  The ln() is
    the one transcendental; both engines evaluate the identical
    smoothed rational, and the term is 6-dp rounded (§7.3-H2
    discipline for libm seams)."""
    o = table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint"), F.lit(8)
        ).alias("bin"),
        F.when(F.col("o_orderdate") < "1997-07-01", 1).otherwise(0)
        .alias("is_ref"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("ref_n"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("cur_n"),
    )
    tot = per_bin.agg(
        F.sum("ref_n").alias("ref_t"),
        F.sum("cur_n").alias("cur_t"),
        F.count("*").alias("n_bins"),
    )
    p_cur = (F.col("cur_n") + 1).cast("double") / (
        F.col("cur_t") + F.col("n_bins")
    )
    p_ref = (F.col("ref_n") + 1).cast("double") / (
        F.col("ref_t") + F.col("n_bins")
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin", "ref_n", "cur_n",
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6)
            .alias("psi_term"),
        )
    )


@query(
    "table_stats_analyze",
    "aggregation/quality",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_d,
           CAST(max(o_orderkey) AS DOUBLE) AS max_d
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE),
           CAST(max(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    """,
)
def table_stats_analyze(spark, sf_dir):
    """Column-statistics collection — the ANALYZE TABLE pass every
    catalog/CBO and every data-profiling dashboard runs per snapshot:
    per column, row count, null count, exact distinct count, and
    numeric min/max, emitted long-format (one row per column).

    Scale shape: ONE scan computes every non-distinct statistic via
    parallel aggregates (map-side partials); the exact distincts
    expand per column inside the same aggregate (Spark plans
    multi-distinct with one expand — at 100 TB swap
    approx_count_distinct in, same query shape).  The long format
    comes from a 4-row stack over the 1-row wide aggregate — no
    second scan.  The oracle spells the same numbers as per-column
    UNION ALL."""
    o = table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_ok"),
        F.countDistinct("o_orderkey").alias("nd_ok"),
        F.min("o_orderkey").cast("double").alias("mn_ok"),
        F.max("o_orderkey").cast("double").alias("mx_ok"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("double").alias("mn_ck"),
        F.max("o_custkey").cast("double").alias("mx_ck"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("nd_tp"),
        F.min("o_totalprice").cast("double").alias("mn_tp"),
        F.max("o_totalprice").cast("double").alias("mx_tp"),
        F.count("o_orderstatus").alias("nn_os"),
        F.countDistinct("o_orderstatus").alias("nd_os"),
    )
    return wide.selectExpr(
        """stack(4,
            'o_orderkey',   n_rows - nn_ok, nd_ok, mn_ok, mx_ok,
            'o_custkey',    n_rows - nn_ck, nd_ck, mn_ck, mx_ck,
            'o_totalprice', n_rows - nn_tp, nd_tp, mn_tp, mx_tp,
            'o_orderstatus', n_rows - nn_os, nd_os,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        ) AS (column_name, n_nulls, n_distinct, min_d, max_d)""",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_d", "max_d",
    )
