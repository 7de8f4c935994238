"""Round-9 analytics additions — warehouse / stats / runtime-pruning
shapes the registry did not cover yet.

Every query follows the repo conventions: identical output aliases on
both engines, no raw DECIMAL output column (exact decimal
accumulation with a final CAST to DOUBLE on BOTH engines —
SURVEY §7.3-H2), deterministic total ordering for every ranked
output, and integer arithmetic wherever an exact rational answer
exists (KS statistic, CUSUM) with the single double division at the
end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .sinks_queries import _scratch_dir


@query(
    "scd2_point_in_time_join",
    "join",
    oracle="""
    WITH periods AS (
        SELECT o_custkey, o_orderstatus,
               o_orderdate AS valid_from,
               COALESCE(lead(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
                   TIMESTAMP '9999-12-31 00:00:00') AS valid_to
        FROM orders
    ), fact AS (
        SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
               l.l_quantity AS qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT p.o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_li,
           CAST(CAST(sum(CAST(f.qty AS DECIMAL(18,2))) AS DOUBLE)
                AS DOUBLE) AS sum_qty
    FROM fact f
    JOIN periods p
      ON f.custkey = p.o_custkey
     AND f.ship >= p.valid_from AND f.ship < p.valid_to
    GROUP BY 1
    """,
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (as-of interval) dimension lookup — THE classic
    warehouse join: each fact row finds the ONE dimension version
    valid at its event time.  The SCD2 timeline is derived per
    customer from their order history (valid_from = order date,
    valid_to = next order's date via lead(), '9999-12-31' open end;
    ties on order date are made total by the o_orderkey tie-break, so
    a same-day pair yields one zero-length period that can never
    match).  The join is an equi-join on the customer key with the
    half-open interval predicate as a residual — Spark shuffles both
    sides once on custkey and probes each customer's handful of
    periods, which is exactly the 100 TB shape (the range residual
    never multiplies rows: periods are disjoint, each fact row
    matches at most one).  Quantities accumulate as DECIMAL and cast
    to DOUBLE at the end (§7.3-H2)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    periods = o.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    okeys = o.select("o_orderkey", "o_custkey")
    fact = li.join(okeys, li["l_orderkey"] == okeys["o_orderkey"]).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("ship"),
        F.col("l_quantity").alias("qty"),
    )
    return (
        fact.join(
            periods,
            (F.col("custkey") == F.col("o_custkey"))
            & (F.col("ship") >= F.col("valid_from"))
            & (F.col("ship") < F.col("valid_to")),
        )
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_li"),
            F.sum(F.col("qty").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "cms_heavy_hitters_verified",
    "sketch",
    oracle="""
    WITH w AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> list_extract(w, i) || ' ' ||
                           list_extract(w, i + 1))) AS g
        FROM w
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh)
    SELECT g AS bigram, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM sh
    GROUP BY g
    HAVING 1000 * count(*) >= (SELECT n FROM tot)
    """,
)
def cms_heavy_hitters_verified(spark, sf_dir):
    """Count-Min-Sketch two-phase heavy hitters — the CMS sibling of
    approx_topk_misra_gries (operators/sketch.py), built ENTIRELY as
    DataFrame aggregates: the sketch table cms[j][h_j(g)] is a
    groupBy over (row of hashes j, xxhash64(g, j) mod width) — a
    BOUNDED-key aggregate (depth×width cells), so at 100 TB the
    map-side combine collapses every partition to ≤ d·w rows before
    the one tiny shuffle; no full-key shuffle of the shingle stream
    ever happens in phase 1.  Estimates are the classic
    min_j cms[j][h_j(g)], read by joining the (vocabulary-sized)
    distinct-shingle frame against the broadcast sketch table; CMS
    error is strictly one-sided (estimate >= true count), so the
    candidates are a provable superset of the true heavy hitters.
    Phase 2 exact-counts only the broadcast candidates and applies
    the true ``1000·count >= N`` bar, so the final answer is exact and
    a plain SQL oracle checks the whole pipeline."""
    from ..operators.dedup import word_bigram_array

    CMS_DEPTH, CMS_WIDTH = 5, 2048
    d = table(spark, sf_dir, "documents").withColumn(
        "_w", F.split("text", " ")
    )
    sh = d.select(F.explode(word_bigram_array(F.col("_w"))).alias("g"))
    # phase 1a: the sketch — explode each row into its d (row, bucket)
    # cells, then a bounded-key aggregate builds the CMS table
    hashed = sh.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_DEPTH - 1}), "
                f"j -> struct(j AS j, "
                f"pmod(xxhash64(g, j), {CMS_WIDTH}) AS bucket))"
            )
        ).alias("cell")
    ).select("cell.j", "cell.bucket")
    cms = hashed.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))
    # phase 1b: estimate every distinct shingle against the broadcast
    # sketch; candidates = estimate over the N/1000 bar
    # distinct's map-side partial dedup keeps the shuffle
    # vocabulary-bounded per partition
    vocab = sh.select("g").distinct()
    probes = vocab.select(
        "g",
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_DEPTH - 1}), "
                f"j -> struct(j AS j, "
                f"pmod(xxhash64(g, j), {CMS_WIDTH}) AS bucket))"
            )
        ).alias("cell"),
    ).select("g", "cell.j", "cell.bucket")
    est = (
        probes.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("g")
        .agg(F.min("cnt").alias("estimate"))
    )
    total = sh.agg(F.count("*").alias("n"))
    cand = (
        est.crossJoin(F.broadcast(total))
        .filter(1000 * F.col("estimate") >= F.col("n"))
        .select("g")
    )
    # phase 2: exact verify over only the candidates
    return (
        sh.join(F.broadcast(cand), "g")
        .groupBy(F.col("g").alias("bigram"))
        .agg(F.count("*").alias("exact_cnt"))
        .crossJoin(F.broadcast(total))
        .filter(1000 * F.col("exact_cnt") >= F.col("n"))
        .select("bigram", "exact_cnt")
    )


@query(
    "sink_hive_dynamic_partition_pruning",
    "sink/scale",
    oracle="""
    WITH mondays AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day
        FROM events
        WHERE dayofweek(CAST(ts AS DATE)) = 1
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(round(e.value, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS DOUBLE) AS sum_value
    FROM events e JOIN mondays m ON CAST(e.ts AS DATE) = m.day
    GROUP BY 1
    """,
)
def sink_hive_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning — the RUNTIME twin of
    sink_hive_partitioned_pruned_scan's static pruning: events are
    written hive-partitioned by day (30 partitions), then joined to a
    dim whose keys are only known at run time (the Mondays, derived
    by a query, broadcast).  Catalyst turns the broadcast join into a
    dynamicpruning subquery on the partition column, so the fact scan
    reads ~4 of 30 partition directories instead of all of them —
    asserted on the formatted plan in tests/test_plans.py.  At 100 TB
    this is the difference between scanning a month and scanning the
    Mondays.  Values are rounded to cents BEFORE the decimal
    accumulation on both engines (the raw doubles are FP-noisy), then
    cast to DOUBLE at the end (§7.3-H2)."""
    import os

    e = table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    dest = _scratch_dir("dpp_events_by_day", sf_dir)
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        e.write.mode("overwrite").partitionBy("day").parquet(dest)
    # explicit schema: a zero-row source writes no partition dirs, so
    # schema inference over the empty sink would fail
    fact = spark.read.schema(e.schema).parquet(dest)
    mondays = (
        e.filter(F.dayofweek(F.col("ts").cast("date")) == 2)  # Monday
        .select(F.col("ts").cast("date").cast("string").alias("day"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(mondays), "day")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "topk_with_others_rollup",
    "window",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation, c.c_custkey AS custkey,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nation, custkey, rev,
               row_number() OVER (PARTITION BY nation
                                  ORDER BY rev DESC, custkey) AS rn
        FROM rev
    )
    SELECT nation,
           CASE WHEN rn <= 3 THEN 'top' || rn ELSE 'OTHERS' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(rev) AS DOUBLE) AS DOUBLE) AS revenue
    FROM ranked
    GROUP BY 1, 2
    """,
)
def topk_with_others_rollup(spark, sf_dir):
    """Top-3 customers per nation with an OTHERS bucket — the BI
    staple that is NOT a plain top-k: the long tail is kept as one
    aggregated row per group, so the report always sums to the group
    total.  Revenue is decimal-exact with ties broken by custkey
    (total order, §7.3-H7); per-nation ranking is one window over the
    customer-grain aggregate (WindowGroupLimit does NOT apply — every
    row is needed, the tail just re-aggregates).  At 100 TB the
    customer-grain aggregate is the only big shuffle; the window and
    the final rollup reuse its (nation) partitioning."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.col("c_custkey").alias("custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("rev"), F.asc("custkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "bucket",
            F.when(F.col("rn") <= 3,
                   F.concat(F.lit("top"), F.col("rn").cast("string")))
            .otherwise(F.lit("OTHERS")),
        )
        .groupBy("nation", "bucket")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@query(
    "ks_two_sample_doc_lengths",
    "stats",
    oracle="""
    WITH s AS (
        SELECT n_chars AS v, CAST(source = 'src0' AS INT) AS is1
        FROM documents WHERE source IN ('src0', 'src1')
    ), counts AS (
        SELECT v,
               CAST(sum(is1) AS BIGINT) AS c1,
               CAST(sum(1 - is1) AS BIGINT) AS c2
        FROM s GROUP BY v
    ), tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2 FROM counts
    ), cdf AS (
        SELECT v,
               sum(c1) OVER (ORDER BY v) AS f1,
               sum(c2) OVER (ORDER BY v) AS f2
        FROM counts
    ), d AS (
        SELECT v, abs(f1 * (SELECT n2 FROM tot)
                      - f2 * (SELECT n1 FROM tot)) AS dnum
        FROM cdf
    )
    SELECT CAST(max(dnum) AS BIGINT) AS d_num,
           (SELECT CAST(min(v) AS BIGINT) FROM d
             WHERE dnum = (SELECT max(dnum) FROM d)) AS at_value,
           CAST(max(dnum) AS DOUBLE)
               / ((SELECT n1 FROM tot) * (SELECT n2 FROM tot)) AS d_stat
    FROM d
    HAVING count(*) > 0
    """,
)
def ks_two_sample_doc_lengths(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic between the n_chars
    distributions of two sources — EXACT by integer arithmetic: with
    per-value cumulative counts f1, f2 and sample sizes n1, n2,
    D = max |f1/n1 - f2/n2| = max |f1·n2 - f2·n1| / (n1·n2), so the
    maximization runs entirely on BIGINTs (no float comparison
    decides anything) and the single double division happens once at
    the end.  The distribution-fitting shape every data-quality
    pipeline runs as "did this source drift?".  Scale: one groupBy on
    (value), a window over the per-value counts (distinct-value-
    bounded, not row-bounded), all integer."""
    d = table(spark, sf_dir, "documents")
    s = d.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        (F.col("source") == "src0").cast("int").alias("is1"),
    )
    counts = s.groupBy("v").agg(
        F.sum("is1").cast("long").alias("c1"),
        F.sum(1 - F.col("is1")).cast("long").alias("c2"),
    )
    wtot = Window.partitionBy()
    wcdf = Window.partitionBy().orderBy("v")
    cdf = counts.select(
        "v",
        F.sum("c1").over(wcdf).alias("f1"),
        F.sum("c2").over(wcdf).alias("f2"),
        F.sum("c1").over(wtot).alias("n1"),
        F.sum("c2").over(wtot).alias("n2"),
    )
    dd = cdf.select(
        "v", "n1", "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        .alias("dnum"),
    )
    wmax = Window.partitionBy()
    return (
        dd.withColumn("mx", F.max("dnum").over(wmax))
        .filter(F.col("dnum") == F.col("mx"))
        .groupBy("mx", "n1", "n2")
        .agg(F.min("v").cast("long").alias("at_value"))
        .select(
            F.col("mx").cast("long").alias("d_num"),
            "at_value",
            (F.col("mx").cast("double")
             / (F.col("n1") * F.col("n2"))).alias("d_stat"),
        )
    )


@query(
    "changepoint_cusum_daily",
    "stats",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), acc AS (
        SELECT event_type, day, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY day) AS pre,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
               sum(c) OVER (PARTITION BY event_type) AS tot,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM daily
    ), scored AS (
        SELECT event_type, day,
               nd * pre - k * tot AS cnum, nd
        FROM acc
    ), best AS (
        SELECT event_type, min(day) AS cp_day
        FROM scored s
        WHERE abs(cnum) = (SELECT max(abs(cnum)) FROM scored s2
                           WHERE s2.event_type = s.event_type)
        GROUP BY 1
    )
    SELECT s.event_type, b.cp_day,
           CAST(abs(s.cnum) AS BIGINT) AS cusum_num,
           CAST(abs(s.cnum) AS DOUBLE) / s.nd AS cusum
    FROM scored s JOIN best b
      ON s.event_type = b.event_type AND s.day = b.cp_day
    """,
)
def changepoint_cusum_daily(spark, sf_dir):
    """CUSUM changepoint detection on the daily event-count series,
    per event type — where does the level shift?  The classic CUSUM
    S_k = Σ_{i<=k}(c_i − mean) is kept EXACT by clearing the mean's
    denominator: S_k·D = D·prefix_k − k·total is pure BIGINT (D =
    days in the series), so the argmax is decided on integers, ties
    broken to the earliest day, and the single double division
    happens only in the output column.  Scale: the daily rollup is
    the only corpus-sized aggregate; everything after runs on
    |types|×|days| rows with windows partitioned by type."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    acc = daily.select(
        "event_type", "day",
        F.sum("c").over(wo).alias("pre"),
        F.row_number().over(wo).alias("k"),
        F.sum("c").over(wa).alias("tot"),
        F.count("*").over(wa).alias("nd"),
    )
    scored = acc.select(
        "event_type", "day", "nd",
        (F.col("nd") * F.col("pre") - F.col("k") * F.col("tot"))
        .alias("cnum"),
    )
    best = (
        scored.withColumn("mx", F.max(F.abs("cnum")).over(wa))
        .filter(F.abs("cnum") == F.col("mx"))
        .groupBy(F.col("event_type").alias("bt"))
        .agg(F.min("day").alias("cp_day"))
    )
    return (
        scored.join(
            best,
            (scored["event_type"] == best["bt"])
            & (scored["day"] == best["cp_day"]),
        )
        .select(
            "event_type",
            "cp_day",
            F.abs("cnum").cast("long").alias("cusum_num"),
            (F.abs("cnum").cast("double") / F.col("nd")).alias("cusum"),
        )
    )


@query(
    "grouping_id_diagnostics",
    "agg",
    oracle="""
    SELECT CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CASE GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                WHEN 0 THEN 'cell' WHEN 1 THEN 'by_status'
                WHEN 2 THEN 'by_priority' ELSE 'total' END AS grain,
           o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_id_diagnostics(spark, sf_dir):
    """GROUPING() provenance flags over a four-grain grouping-sets
    cube — completes the rollup/cube family with the diagnostic
    column BI layers key on to route subtotal rows (NULL in a group
    column is ambiguous between "subtotal" and "the value was NULL";
    GROUPING() disambiguates).  The gid is computed the same way on
    both engines (grouping(status)*2 + grouping(priority)) because
    native GROUPING_ID bit orders differ across engines.  Decimal-
    exact revenue, double at the end (§7.3-H2)."""
    o = table(spark, sf_dir, "orders")
    gid = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
    return (
        # cube(a, b) = exactly the oracle's four grouping sets
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            gid.cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "gid",
            F.when(F.col("gid") == 0, "cell")
            .when(F.col("gid") == 1, "by_status")
            .when(F.col("gid") == 2, "by_priority")
            .otherwise("total")
            .alias("grain"),
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            "revenue",
        )
    )


@query(
    "decile_lift_table",
    "stats",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT o_custkey, spend, n_orders,
               ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM spend
    ), tot AS (
        SELECT sum(spend) AS tot_spend,
               CAST(count(*) AS BIGINT) AS n_cust
        FROM spend
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(spend) AS DOUBLE) AS DOUBLE) AS decile_spend,
           CAST(10.0 AS DOUBLE)
               * (CAST(sum(spend) AS DOUBLE)
                  / CAST((SELECT tot_spend FROM tot) AS DOUBLE)) AS lift
    FROM ranked
    GROUP BY 1
    """,
)
def decile_lift_table(spark, sf_dir):
    """Decile lift table — the model-evaluation / campaign-targeting
    staple: rank customers by spend, cut into 10 equal buckets, and
    report each bucket's share of total spend relative to the 10%
    baseline (lift = 10·share).  The Spark side NEVER runs a global
    single-partition window: the rank comes from the two-pass
    range-partitioned ``ranged_row_number`` (operators/scale.py), and
    the bucket is derived from (rank, n) with ntile's exact
    first-buckets-get-the-remainder arithmetic — r <= rem·(q+1) →
    ceil(r/(q+1)), else rem + ceil((r−rem·(q+1))/q) — all integers,
    provably identical to the oracle's ntile(10) under the same
    (spend DESC, custkey) total order (§7.3-H7).  Spend accumulates
    as DECIMAL; the two ratios are double divisions of exact sums at
    the very end.  Scale: one customer-grain aggregate, the sampled
    range exchange, a 10-key rollup."""
    from ..operators.scale import ranged_row_number

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
    )
    ranked = ranged_row_number(
        spend, [F.desc("spend"), F.asc("o_custkey")], "r"
    )
    totals = spend.agg(
        F.count("*").alias("n"), F.sum("spend").alias("tot_spend")
    )
    # ntile(10) arithmetic, all integer: q+1-sized buckets first.
    # ceil(a/b) for positive longs = (a + b - 1) DIV b — never a
    # double division (exact past 2^53).  greatest(q, 1) keeps the
    # untaken ELSE branch division well-defined when n < 10.
    bucket = F.expr(
        "CASE WHEN r <= (n % 10) * (n DIV 10 + 1) "
        "THEN (r + n DIV 10) DIV (n DIV 10 + 1) "
        "ELSE n % 10 + (r - (n % 10) * (n DIV 10 + 1) "
        "+ greatest(n DIV 10, 1) - 1) DIV greatest(n DIV 10, 1) END"
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .withColumn("decile", bucket.cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("spend").cast("double").alias("decile_spend"),
            (
                F.lit(10.0)
                * (
                    F.sum("spend").cast("double")
                    / F.first("tot_spend").cast("double")
                )
            ).alias("lift"),
        )
    )


@query(
    "fulfillment_lead_time_histogram",
    "analytics",
    oracle="""
    WITH lt AS (
        SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN days < 0 THEN 'pre-order'
                WHEN days <= 7 THEN 'week1'
                WHEN days <= 30 THEN 'month1'
                WHEN days <= 90 THEN 'quarter'
                ELSE 'long-tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lt GROUP BY 1
    """,
)
def fulfillment_lead_time_histogram(spark, sf_dir):
    """Order-to-ship lead-time distribution — the fulfillment-SLA
    histogram: per line item, days between the order date and its
    ship date, bucketed into fixed service bands.  datediff is
    integer-exact on both engines (calendar-day difference of
    timestamps), so the histogram has no float anywhere.  Scale: one
    fact-to-fact equi-join on the order key (co-partitionable), then
    a 5-key aggregate with map-side combine."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(days.alias("days"))
        .select(
            F.when(F.col("days") < 0, "pre-order")
            .when(F.col("days") <= 7, "week1")
            .when(F.col("days") <= 30, "month1")
            .when(F.col("days") <= 90, "quarter")
            .otherwise("long-tail")
            .alias("bucket"),
            "days",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.min("days").alias("min_days"),
            F.max("days").alias("max_days"),
        )
    )


@query(
    "union_schema_evolution_align",
    "setops",
    oracle="""
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(o_totalprice AS DOUBLE) AS price, NULL AS priority
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, NULL, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 5
    """,
)
def union_schema_evolution_align(spark, sf_dir):
    """Schema-evolution union — the ingest-reality shape where two
    batches of the same feed carry DIFFERENT column subsets (a column
    added or retired mid-stream) and must align by NAME with NULL
    padding, not by position: ``unionByName(allowMissingColumns=
    True)``.  A positional UNION here would silently put prices in
    the priority column — the classic evolution bug this operator
    exists to prevent.  The oracle spells out the NULL padding
    explicitly.  Scale: union is a zero-shuffle plan node; the
    alignment is purely logical."""
    o = table(spark, sf_dir, "orders")
    old_batch = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    new_batch = o.filter(F.col("o_orderkey") % 10 == 5).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True)


@query(
    "sequence_pattern_regex_funnel",
    "analytics",
    oracle="""
    WITH coded AS (
        SELECT user_id,
               string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          ELSE 'e' END, '' ORDER BY ts, event_id)
                   AS journey
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE regexp_matches(journey,
                's[^e]*p')) AS BIGINT) AS n_clean_converts,
           CAST(count(*) FILTER (WHERE regexp_matches(journey, 'e'))
                AS BIGINT) AS n_with_error
    FROM coded
    """,
)
def sequence_pattern_regex_funnel(spark, sf_dir):
    """Sequence-pattern matching (the MATCH_RECOGNIZE shape, which
    neither engine implements): each user's event history collapses
    to a one-char-per-event journey string in exact (ts, event_id)
    order, and the business pattern — a signup later followed by a
    purchase with NO error in between — is one regex over it
    (``s[^e]*p``).  Counts users matching, plus the error-touched
    cohort.  The encode step is a single groupBy with an in-group
    sort (array_sort of (ts, id, code) structs — no window, no second
    shuffle); journeys are bounded by per-user event counts, and the
    regex runs once per user, JVM-side, on both engines.  The char
    alphabet makes the regex engine-portable (no regex-dialect
    hazards)."""
    e = table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    coded = (
        e.select("user_id", F.struct("ts", "event_id", code.alias("c")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["c"]
                ),
                "",
            ).alias("journey")
        )
    )
    return coded.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("journey").rlike("s[^e]*p"), 1))
        .cast("long")
        .alias("n_clean_converts"),
        F.count(F.when(F.col("journey").rlike("e"), 1))
        .cast("long")
        .alias("n_with_error"),
    )


@query(
    "time_weighted_avg_balance",
    "analytics",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS bal,
               CAST(date_diff('day', o_orderdate,
                    lead(o_orderdate) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
                   AS days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           CAST(sum(days) AS BIGINT) AS total_days,
           CAST(CAST(sum(bal * days) AS DOUBLE)
                / CAST(sum(days) AS DOUBLE) AS DOUBLE) AS twab
    FROM seq
    WHERE days IS NOT NULL
    GROUP BY 1
    HAVING sum(days) > 0
    """,
)
def time_weighted_avg_balance(spark, sf_dir):
    """Time-weighted average balance — the finance-warehouse classic
    where a plain AVG is wrong: each customer's cumulative spend
    level is weighted by how many DAYS it was in force (until their
    next order; the open-ended last period is excluded).  Balance
    accumulates as DECIMAL, the day weights are exact integers, the
    weighted sum is decimal×int (still exact), and the single double
    division happens at the end — zero float accumulation anywhere.
    Same-day consecutive orders get zero weight and drop out, so the
    o_orderkey tie-break never changes the answer.  Scale: one
    shuffle on custkey drives both windows and the final aggregate."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("bal"),
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("days"),
    )
    return (
        seq.filter(F.col("days").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum("days").alias("total_days"),
            (
                F.sum(F.col("bal") * F.col("days")).cast("double")
                / F.sum("days").cast("double")
            ).alias("twab"),
        )
        .filter(F.col("total_days") > 0)
        .select("custkey", "total_days", "twab")
    )


@query(
    "interval_union_coverage",
    "analytics",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + 1800000000 AS e
        FROM events
    ), marked AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max_e
        FROM iv
    )
    SELECT user_id,
           CAST(sum(greatest(e - greatest(s, COALESCE(prev_max_e, s)),
                             0)) AS BIGINT) AS covered_us
    FROM marked
    GROUP BY 1
    """,
)
def interval_union_coverage(spark, sf_dir):
    """Interval-union length (sweep line): each event opens a 30-min
    activity interval; per user, the total UNION-covered time — the
    dedup-overlaps twin of max_concurrent_sessions' peak.  The
    classic one-window formulation: with intervals sorted by start,
    the new coverage of interval i is ``max(0, e_i − max(s_i,
    running-max-end before i))``, so one window + one aggregate
    replaces any self-join.  All arithmetic is integer microseconds
    (epoch_us on both engines) — exact.  Scale: one shuffle on
    user_id; the running max is a bounded-state frame."""
    e = table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")  # unix_micros rejects NTZ; UTC session makes the relabel exact
    iv = e.select(
        "user_id",
        F.unix_micros(ts).alias("s"),
        (F.unix_micros(ts) + F.lit(1_800_000_000)).alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w))
    new_cov = F.greatest(
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.col("prev_max_e"), F.col("s"))),
        F.lit(0),
    )
    return marked.groupBy("user_id").agg(
        F.sum(new_cov).cast("long").alias("covered_us")
    )


@query(
    "dq_referential_integrity",
    "data-quality",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_child,
           CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
               AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'customer->nation', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across the star schema — the
    foreign-key orphan counts every warehouse loads gate on.  Each
    edge is one anti-join-shaped aggregate (left join + null-count);
    dimension sides broadcast, the two fact-to-fact edges shuffle on
    their keys.  At 100 TB this is the post-load validation pass
    that runs before anything downstream trusts the data."""

    def edge(label, child, ckey, parent, pkey):
        p = parent.select(pkey).withColumn("_hit", F.lit(1))
        return (
            child.select(F.col(ckey).alias("_k"))
            .join(p, F.col("_k") == F.col(pkey), "left")
            .agg(
                F.lit(label).alias("fk"),
                F.count("*").alias("n_child"),
                F.count(F.when(F.col("_hit").isNull(), 1))
                .cast("long")
                .alias("n_orphans"),
            )
        )

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionAll(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
        .unionAll(edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"))
        .unionAll(edge("customer->nation", c, "c_nationkey", n, "n_nationkey"))
    )


@query(
    "percentile_cont_interpolated",
    "stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(round(quantile_cont(o_totalprice, 0.5), 6) AS DOUBLE)
               AS p50,
           CAST(round(quantile_cont(o_totalprice, 0.95), 6) AS DOUBLE)
               AS p95,
           CAST(round(quantile_cont(o_totalprice, 0.99), 6) AS DOUBLE)
               AS p99
    FROM orders
    GROUP BY 1
    """,
)
def percentile_cont_interpolated(spark, sf_dir):
    """ANSI ``PERCENTILE_CONT`` — the INTERPOLATED quantile, completing
    the family next to the exact nearest-rank forms
    (percentiles_exact_scalable / percentiles_by_group_exact):
    between the two straddling order statistics the answer is the
    linear blend (1−f)·lo + f·hi, which is what BI tools mean by
    "median".  Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share the formula; the single lerp is rounded at 6 dp on both
    engines (the inputs are 2-dp prices, so the blend carries only a
    few low bits of noise — §7.3-H2).  Scale: Spark's exact
    percentile aggregates per-group sorted buffers; for corpus-scale
    groups the two-pass range-partitioned form (operators/scale.py)
    is the escape hatch, as documented there."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
    )


@query(
    "fn_explode_outer_preserves_empty",
    "functions",
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 3 = 0 THEN []
                    ELSE string_split(o_orderpriority, '-') END AS arr
        FROM orders WHERE o_orderkey < 500
    )
    SELECT k, u.part, CAST(len(arr) AS INT) AS arr_len
    FROM src LEFT JOIN LATERAL unnest(arr) AS u(part) ON true
    """,
)
def fn_explode_outer_preserves_empty(spark, sf_dir):
    """``explode_outer`` null semantics — the ingest case a plain
    explode silently DROPS: rows whose array is empty (or NULL) must
    survive with a NULL element, or every downstream count loses the
    no-attachment entities.  One third of the keys get an empty array
    by construction; the oracle spells the same semantics as a LEFT
    JOIN LATERAL UNNEST.  Completes the explode family next to
    fn_explode_unnest (inner) and fn_posexplode_ordinal."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    src = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<string>"))
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("arr"),
    )
    return src.select(
        "k",
        F.explode_outer("arr").alias("part"),
        F.size("arr").alias("arr_len"),
    )


@query(
    "chunk_level_dup_rate",
    "LLM-pipeline",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               array_to_string(list_slice(w, s, least(s + 19, n_words)),
                               ' ') AS chunk
        FROM (
            SELECT doc_id, w, len(w) AS n_words,
                   unnest(generate_series(1, len(w), 15)) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents)
        )
    ), grp AS (
        SELECT md5(chunk) AS k,
               CAST(count(*) AS BIGINT) AS c,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM chunks GROUP BY 1
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c) - count(*) AS BIGINT) AS n_redundant,
           CAST(count(*) FILTER (WHERE n_docs > 1) AS BIGINT)
               AS n_cross_doc,
           CAST(CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS DOUBLE)
               AS dup_rate
    FROM grp
    """,
)
def chunk_level_dup_rate(spark, sf_dir):
    """Passage-level duplication (Lee et al.'s exact-substring signal
    at CHUNK granularity): slide the 20/15 training-chunk window over
    every document, digest each chunk, and measure how much of the
    chunk stream is redundant — including the count of chunks
    repeated ACROSS documents (the boilerplate/quotation signal that
    doc-level dedup cannot see).  Chunking is the map-only JVM path
    of chunk_documents_overlap (whole corpus, no cap); the digest
    groupBy shuffles 16-byte keys; the summary is one row.  At 100 TB
    this is THE metric that decides whether passage-level dedup is
    worth its cost on a given corpus."""
    size, stride = 20, 15
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    d = d.select("doc_id", w.alias("w"), F.size(w).alias("n_words"))
    chunks = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.col("n_words"), F.lit(stride))
        ).alias("s"),
        "w",
        "n_words",
    ).select(
        "doc_id",
        F.array_join(
            F.slice(
                "w", F.col("s"),
                F.least(F.col("s") + size - 1, F.col("n_words"))
                - F.col("s") + 1,
            ),
            " ",
        ).alias("chunk"),
    )
    grp = chunks.select("doc_id", F.md5("chunk").alias("k")).groupBy("k").agg(
        F.count("*").alias("c"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return grp.agg(
        F.sum("c").alias("n_chunks"),
        F.count("*").alias("n_distinct"),
        (F.sum("c") - F.count("*")).cast("long").alias("n_redundant"),
        F.count(F.when(F.col("n_docs") > 1, 1))
        .cast("long")
        .alias("n_cross_doc"),
        (
            (F.sum("c") - F.count("*")).cast("double")
            / F.sum("c").cast("double")
        ).alias("dup_rate"),
    )
