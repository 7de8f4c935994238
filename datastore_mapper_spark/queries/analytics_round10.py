"""Round-10 analytics wave: join/subquery semantics seams (mark join,
three-valued NOT IN), windowed distinct emulation, integer-exact
anomaly flags, leakage-free target encoding.

Every oracle keeps float math to a single division of exact integers
or routes comparisons through integer algebra entirely (SURVEY
§7.3-H2), so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "join_existence_mark_flag",
    "join",
    oracle="""
    SELECT c_custkey, c_name,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer c
    """,
)
def join_existence_mark_flag(spark, sf_dir):
    """MARK join: EXISTS as a projected boolean column rather than a
    filter — the shape DuckDB plans as a dedicated mark join and Spark
    expresses as a left join against the distinct filtered key set
    plus coalesce(flag, false).  Unlike join_semi this KEEPS every
    left row; at 100 TB the distinct-key build side is the small
    relation (bounded by matching customers, not orders), so it
    broadcasts where the raw fact table never could."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_m", F.lit(True))
    )
    return c.join(F.broadcast(o), "c_custkey", "left").select(
        "c_custkey", "c_name",
        F.coalesce(F.col("_m"), F.lit(False)).alias("has_urgent"),
    )


@query(
    "not_in_null_trap_counts",
    "subquery",
    oracle="""
    WITH probe AS (
        SELECT o_custkey AS k FROM orders
        UNION ALL SELECT NULL
    )
    SELECT
        CAST((SELECT count(*) FROM customer
              WHERE c_custkey NOT IN (SELECT k FROM probe)) AS BIGINT)
            AS n_not_in,
        CAST((SELECT count(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM probe p
                                WHERE p.k = c.c_custkey)) AS BIGINT)
            AS n_not_exists
    """,
)
def not_in_null_trap_counts(spark, sf_dir):
    """Three-valued-logic seam, graded: ``NOT IN`` against a set
    containing NULL is never TRUE (every comparison is UNKNOWN), so
    ``n_not_in`` must be 0 while the ``NOT EXISTS`` twin counts the
    genuinely order-less customers — both engines must agree on BOTH.
    Spark plans the NOT IN as a null-aware anti join (a broadcast
    nested-loop under the hood — exactly why 100 TB pipelines write
    NOT EXISTS instead; this query documents the trap and pins the
    semantics)."""
    table(spark, sf_dir, "customer")
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH probe AS (
            SELECT o_custkey AS k FROM orders
            UNION ALL SELECT NULL
        )
        SELECT
            CAST((SELECT count(*) FROM customer
                  WHERE c_custkey NOT IN (SELECT k FROM probe))
                 AS BIGINT) AS n_not_in,
            CAST((SELECT count(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM probe p
                                    WHERE p.k = c.c_custkey))
                 AS BIGINT) AS n_not_exists
        """
    )


@query(
    "window_count_distinct_running",
    "window",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id
               ORDER BY ts::TIMESTAMP, event_id
           ) AS INT) AS n_types_so_far
    FROM events
    """,
)
def window_count_distinct_running(spark, sf_dir):
    """Running COUNT(DISTINCT) per user — a window shape Spark's
    engine does NOT support natively (DISTINCT aggregates over window
    frames raise), emulated exactly as ``size(collect_set() OVER w)``:
    the set is bounded by the event-type vocabulary (5 here; small by
    nature for categorical columns), so state per row is O(|vocab|),
    not O(rows) — the precondition that makes this emulation
    100 TB-safe where collect_set over an unbounded-cardinality column
    would not be.  event_id breaks ordering ties so the running frame
    is deterministic on both engines."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_so_far"),
    )


@query(
    "event_rate_anomaly_zscore",
    "data-quality",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT *,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS s,
               CAST(sum(x * x) OVER (PARTITION BY event_type) AS BIGINT)
                   AS ss
        FROM daily
    )
    SELECT event_type, d, x,
           (n * x - s) * (n * x - s) > 4 * (n * ss - s * s) AS is_anomaly
    FROM stats
    """,
)
def event_rate_anomaly_zscore(spark, sf_dir):
    """Daily-volume anomaly flags at |z| > 2 population sigmas —
    denominator-cleared to INTEGER algebra so no sqrt or double mean
    ever computes: |x − S/n| > 2·σ ⟺ (n·x − S)² > 4·(n·SS − S²),
    exact in int64 (x ≤ 10⁶, n ≤ 10³ keeps every product < 2⁶³).
    One groupBy for the daily counts, one window over the tiny
    (event_type, day) grid — at 100 TB the grid is KB-sized however
    big the fact table is, so the stats window is free."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts_us").alias("d")
    ).agg(F.count("*").alias("x"))
    w = Window.partitionBy("event_type")
    n = F.count("*").over(w)
    s = F.sum("x").over(w)
    ss = F.sum(F.col("x") * F.col("x")).over(w)
    return daily.select(
        "event_type", "d", "x",
        ((n * F.col("x") - s) * (n * F.col("x") - s)
         > 4 * (n * ss - s * s)).alias("is_anomaly"),
    )


@query(
    "target_encoding_loo",
    "LLM-pipeline",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderpriority AS g,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), stats AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM t GROUP BY g
    )
    SELECT t.o_orderkey, t.g,
           CASE WHEN stats.n > 1
                THEN CAST(stats.s - t.cents AS DOUBLE) / (stats.n - 1)
           END AS loo_mean_cents
    FROM t JOIN stats USING (g)
    """,
)
def target_encoding_loo(spark, sf_dir):
    """Leave-one-out target encoding — the leakage-free categorical
    encoder every feature pipeline needs: each row's category value is
    the mean target of the OTHER rows in its category,
    (S_g − x) / (n_g − 1), never including itself.  Computed as one
    group aggregate broadcast back onto the rows (no window, no
    self-join): group count is category-vocabulary-sized.  The target
    rides as integer cents (explicit floor(double·100) on BOTH engines —
    DuckDB's double→BIGINT cast rounds while Spark's truncates, a
    real seam this query tripped on first contact) so the only float op is the final division of exact
    int64s — bitwise-reproducible."""
    t = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    stats = t.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    return t.join(F.broadcast(stats), "g").select(
        "o_orderkey",
        "g",
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("cents")).cast("double") / (F.col("n") - 1),
        ).alias("loo_mean_cents"),
    )


@query(
    "percentile_disc_exact_by_group",
    "stats",
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.95) AS p95
    FROM orders
    GROUP BY 1
    """,
)
def percentile_disc_exact_by_group(spark, sf_dir):
    """ANSI ``PERCENTILE_DISC`` — the DISCRETE quantile that returns an
    ACTUAL element (the smallest value whose cumulative share reaches
    p, rank ceil(p·n)), completing the family next to the interpolated
    percentile_cont_interpolated.  Implemented as the scalable
    rank-pick: one sort-window pass assigns row_number and group
    count, then the target rank is selected by INTEGER comparison
    (100·rn ≥ p100·n ∧ 100·(rn−1) < p100·n ⟺ rn = ceil(p·n) exactly,
    since every p here is a /100 rational) — no float rank arithmetic,
    so the pick agrees with DuckDB's quantile_disc at every group size
    including exact multiples.  The output is an exact input value —
    zero float seams by construction, the reason PERCENTILE_DISC is
    the quantile of choice for cross-engine contracts.  At 100 TB the
    same two-pass form range-partitions the sort exactly like
    percentiles_exact_scalable."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wn = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(p100: int, name: str):
        hit = (100 * F.col("rn") >= p100 * F.col("n")) & (
            100 * (F.col("rn") - 1) < p100 * F.col("n")
        )
        return F.max(F.when(hit, F.col("o_totalprice"))).alias(name)

    return ranked.groupBy("o_orderstatus").agg(
        pick(25, "p25"), pick(50, "p50"), pick(95, "p95")
    )


@query(
    "binary_auc_exact",
    "ml-eval",
    oracle="""
    WITH t AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), ranked AS (
        SELECT y,
               CAST(rank() OVER (ORDER BY s) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS ties
        FROM t
    ), agg AS (
        SELECT CAST(sum(y) AS BIGINT) AS np,
               CAST(sum(1 - y) AS BIGINT) AS nn,
               CAST(sum(CASE WHEN y = 1
                             THEN 2 * r + ties - 1 END) AS BIGINT) AS s2
        FROM ranked
    )
    SELECT np AS n_pos, nn AS n_neg,
           CAST(s2 - np * (np + 1) AS DOUBLE) / (2 * np * nn) AS auc
    FROM agg
    """,
)
def binary_auc_exact(spark, sf_dir):
    """Exact ROC-AUC as the Mann-Whitney rank statistic — the eval
    metric every data-curation classifier ships with, computed
    tie-correctly and INTEGER-CLEARED: with average ranks
    ``r̄ = (2·minrank + ties − 1) / 2``, AUC =
    (Σ_pos 2r̄ − n₊(n₊+1)) / (2·n₊·n₋) — numerator and denominator are
    exact int64, so the only float op is the final division.  The plan
    aggregates to the SCORE HISTOGRAM first (map-side combinable) and
    prefix-sums ranks over distinct scores only, so no task ever sorts
    the fact table and the pairwise Σ[s₊ > s₋] form (n₊·n₋ pairs)
    never appears; at 100 TB a histogram over integer cents is
    dictionary-tier however large the input.  Scores
    ride as integer cents (explicit floor on both engines — the
    double→BIGINT cast-rounding seam found by target_encoding_loo)."""
    t = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    # one map-side-combinable aggregate to the SCORE HISTOGRAM, then
    # the rank prefix-sum runs over distinct scores only — the
    # unpartitioned window touches a dictionary-tier relation, never
    # the fact table (minrank = cum_before + 1, so each positive at a
    # tie group contributes 2·cum_before + cnt + 1 = 2·r̄)
    hist = t.groupBy("s").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    return hist.agg(
        F.sum("pos").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
        F.sum(
            F.col("pos")
            * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("s2"),
    ).select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        ((F.col("s2") - F.col("np") * (F.col("np") + 1)).cast("double")
         / (2 * F.col("np") * F.col("nn"))).alias("auc"),
    )


@query(
    "confusion_matrix_threshold_sweep",
    "ml-eval",
    oracle="""
    WITH t AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), thr AS (
        SELECT unnest([5000000, 10000000, 15000000, 20000000, 30000000])
            AS thr_cents
    )
    SELECT thr_cents,
           CAST(sum(CASE WHEN s >= thr_cents AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN s >= thr_cents AND y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN s < thr_cents AND y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           CAST(sum(CASE WHEN s < thr_cents AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn
    FROM t CROSS JOIN thr
    GROUP BY thr_cents
    """,
)
def confusion_matrix_threshold_sweep(spark, sf_dir):
    """Confusion matrices at a broadcast grid of decision thresholds —
    the operating-point sweep behind every precision/recall curve.
    One scan of the scored relation crossed with a 5-row literal
    threshold dimension (broadcast — the pattern that scales: never
    re-scan per threshold), conditional integer counts per cell.
    Precision/recall/F1 are downstream integer ratios the caller
    derives; the query ships the exact counts, which is what you
    persist at 100 TB (the curve is re-derivable, the counts are
    not)."""
    t = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    thr = spark.createDataFrame(
        [(v,) for v in (5000000, 10000000, 15000000, 20000000, 30000000)],
        "thr_cents bigint",
    )
    hit = F.col("s") >= F.col("thr_cents")
    pos = F.col("y") == 1
    return (
        t.crossJoin(F.broadcast(thr))
        .groupBy("thr_cents")
        .agg(
            F.sum(F.when(hit & pos, 1).otherwise(0)).alias("tp"),
            F.sum(F.when(hit & ~pos, 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~hit & ~pos, 1).otherwise(0)).alias("tn"),
            F.sum(F.when(~hit & pos, 1).otherwise(0)).alias("fn"),
        )
    )
