"""Extension window-function queries (beyond SURVEY §2.B #23-30):
RANGE frames (numeric + interval), ignore-nulls navigation,
cume_dist/percent_rank, nth_value, global shares, z-score anomalies."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "window_cume_percent",
    "window",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_percent(spark, sf_dir):
    """Distribution window functions — exact rank-ratio arithmetic, so
    no rounding is needed."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "window_range_frame",
    "window frame",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 4) AS rsum
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """Value-based RANGE frame (vs the ROWS frames of #26/#27): sum of
    all orders within 1000.0 below the current price per customer.
    RANGE frames include ties identically in both engines."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 4) AS rsum
        FROM orders
        """
    )


@query(
    "window_ignore_nulls",
    "window",
    oracle="""
    SELECT o_orderkey,
           last_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_nonopen
    FROM orders
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS navigation — last non-NULL value seen so far per
    partition (the gap-fill / last-observation-carried-forward
    primitive).  Note the dialect seam: Spark puts IGNORE NULLS after
    the call, DuckDB inside the argument list."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               last_value(nullif(o_orderstatus, 'O')) IGNORE NULLS OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_nonopen
        FROM orders
        """
    )


@query(
    "window_global_share",
    "window",
    oracle="""
    SELECT o_orderstatus, count(*) AS cnt,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def window_global_share(spark, sf_dir):
    """Empty-partition window over an aggregate (share of total) — one
    pass: grouped counts, then a scalar window instead of a self-join
    against the grand total."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS cnt,
               round(CAST(count(*) AS DOUBLE)
                     / sum(count(*)) OVER (), 6) AS share
        FROM orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "window_nth_dense",
    "window",
    oracle="""
    SELECT o_orderkey, dense_rank() OVER w AS dr,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_nth_dense(spark, sf_dir):
    """dense_rank + nth_value with a full-partition frame (each
    customer's second-priciest order key on every row) — nth_value
    needs the explicit UNBOUNDED FOLLOWING frame or rows before
    position n see NULL."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, dense_rank() OVER w AS dr,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
        """
    )


@query(
    "window_range_interval",
    "window",
    oracle="""
    SELECT user_id,
           ts::TIMESTAMP AS ts_us,
           event_type,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts::TIMESTAMP
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS cnt_1h,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts::TIMESTAMP
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 4) AS val_1h
    FROM events
    WHERE user_id < 50
    """,
)
def window_range_interval(spark, sf_dir):
    """Time-interval RANGE frame (trailing 1-hour count/sum per user) —
    the value-range sibling of the ROWS frames in #26/#27 and the batch
    twin of a sliding stream aggregate.  One shuffle on ``user_id``;
    the frame is evaluated with a sliding sort-based accumulator, no
    self-join."""
    table(spark, sf_dir, "events").createOrReplaceTempView("__ev_range_interval")
    return spark.sql(
        """
        SELECT user_id, ts_us, event_type,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS cnt_1h,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ), 4) AS val_1h
        FROM __ev_range_interval
        WHERE user_id < 50
        """
    )


@query(
    "anomaly_zscore_window",
    "window",
    oracle="""
    WITH z AS (
        SELECT event_id, user_id, value,
               avg(value) OVER (PARTITION BY user_id) AS mu,
               stddev_samp(value) OVER (PARTITION BY user_id) AS sd
        FROM events
    )
    SELECT event_id, user_id,
           round((value - mu) / sd, 4) AS z
    FROM z
    WHERE sd > 0 AND abs((value - mu) / sd) > 2.5
    """,
)
def anomaly_zscore_window(spark, sf_dir):
    """Per-user z-score outlier filter over an unbounded window — the
    quality-filtering shape (flag statistical outliers per group)
    training-data pipelines run before sampling.  Single shuffle on
    ``user_id``; both engines share the stddev_samp definition and the
    score is 4-dp pinned (§7.3-H2).  The ``sd > 0`` guard keeps the
    divide deterministic for single-event users."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    z = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    zexpr = (F.col("value") - F.col("mu")) / F.col("sd")
    return z.filter((F.col("sd") > 0) & (F.abs(zexpr) > 2.5)).select(
        "event_id", "user_id", F.round(zexpr, 4).alias("z")
    )


@query(
    "user_longest_streak",
    "window/islands",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts::TIMESTAMP AS DATE) AS d
        FROM events
    ), grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS island
        FROM ud
    ), streaks AS (
        SELECT user_id, island, count(*) AS len
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    HAVING max(len) >= 3
    """,
)
def user_longest_streak(spark, sf_dir):
    """Gaps-and-islands: longest run of CONSECUTIVE active days per
    user (the product 'streak' metric).  The classic trick — date
    minus row_number is constant within an island — needs only one
    window shuffle on the user key; dedup to (user, day) first so the
    100 TB event volume collapses to |users|×|days| before the
    window."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts_us").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = ud.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count("*").alias("n_streaks"),
        )
        .filter(F.col("longest_streak") >= 3)
    )


@query(
    "event_markov_transitions",
    "window/sequence",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts::TIMESTAMP, event_id)
                   AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_markov_transitions(spark, sf_dir):
    """First-order Markov transition counts over each user's event
    sequence (lead over event time, ties broken on event_id) — the
    behavioral-model input matrix (normalize rows for probabilities).
    One window shuffle on the user key, then a tiny
    |event_types|² aggregate."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "revenue_mom_growth",
    "window/reporting",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate::TIMESTAMP)
                    AS TIMESTAMP) AS month,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue AS DOUBLE)
                 / NULLIF(CAST(lag(revenue) OVER (ORDER BY month)
                               AS DOUBLE), 0.0) - 1.0, 6) AS mom_growth
    FROM monthly
    """,
)
def revenue_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth: decimal-exact monthly sums,
    then lag over the (tiny) month series — the period-over-period
    reporting staple.  The expensive aggregate partial-combines
    map-side; the window runs over |months| rows, so the global
    ordering costs nothing."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w).cast("double")
    return monthly.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("revenue").cast("double") / F.nullif(prev, F.lit(0.0)) - 1.0,
            6,
        ).alias("mom_growth"),
    )


@query(
    "daily_new_vs_returning",
    "window/growth",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts::TIMESTAMP AS DATE) AS d
        FROM events
    ), firsts AS (
        SELECT user_id, min(d) AS first_day FROM ud GROUP BY user_id
    )
    SELECT ud.d AS day,
           CAST(count(*) FILTER (WHERE ud.d = f.first_day) AS BIGINT)
               AS new_users,
           CAST(count(*) FILTER (WHERE ud.d > f.first_day) AS BIGINT)
               AS returning_users
    FROM ud JOIN firsts f ON ud.user_id = f.user_id
    GROUP BY ud.d
    """,
)
def daily_new_vs_returning(spark, sf_dir):
    """Daily active users split into new vs returning (first-seen day
    per user vs activity day) — the growth-accounting staple.  The
    (user, day) dedup collapses event volume before the per-user min
    and the final per-day aggregate; both shuffles ride the user key
    until the last, tiny, per-day rollup."""
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts_us").alias("d")).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("first_day"))
    return (
        ud.join(firsts, "user_id")
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.count(F.when(F.col("d") == F.col("first_day"), 1))
            .alias("new_users"),
            F.count(F.when(F.col("d") > F.col("first_day"), 1))
            .alias("returning_users"),
        )
    )


@query(
    "customer_abc_pareto",
    "window/reporting",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS revenue
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, revenue,
               CAST(sum(revenue) OVER (ORDER BY revenue DESC, o_custkey)
                    AS DOUBLE)
               / CAST(sum(revenue) OVER () AS DOUBLE) AS cum_share
        FROM spend
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS klass,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(revenue) AS DECIMAL(38,2)) AS DOUBLE)
               AS class_revenue
    FROM ranked
    GROUP BY 1
    """,
)
def customer_abc_pareto(spark, sf_dir):
    """ABC (Pareto) classification: rank customers by revenue, take the
    running revenue share, and cut classes at 80 %/95 % — the
    inventory/CRM classification classic.  Revenue sums stay decimal
    until the single share division.

    Scale shape (round-4 VERDICT watch-list item): the running share is
    a global-order cumulative sum, which as a bare window serializes
    |customers| rows through one task.  Computed here with the two-pass
    range-partition operator (``ranged_running_sum``): each task owns a
    disjoint revenue range, only the per-partition offset table crosses
    a global window.  Decimal addition reassociates exactly, so the
    result is bitwise-identical to the single-window plan."""
    from ..operators.scale import ranged_running_sum

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    total = spend.agg(
        F.sum("revenue").cast("double").alias("__total")
    )
    ranked = ranged_running_sum(
        spend,
        [F.desc("revenue"), F.asc("o_custkey")],
        "revenue",
        "cum_rev",
    ).crossJoin(F.broadcast(total)).withColumn(
        "cum_share", F.col("cum_rev").cast("double") / F.col("__total")
    )
    klass = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(klass.alias("klass")).agg(
        F.count("*").alias("n_customers"),
        F.sum("revenue").cast("decimal(38,2)").cast("double")
        .alias("class_revenue"),
    )


@query(
    "order_interarrival_stats",
    "window/behavior",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate::TIMESTAMP) OVER w,
                         o_orderdate::TIMESTAMP) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap_days), 4) AS avg_gap_days,
           round(quantile_cont(gap_days, 0.5), 4) AS median_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    """,
)
def order_interarrival_stats(spark, sf_dir):
    """Inter-arrival gaps between consecutive orders per customer
    (lag over the business key), summarized corpus-wide — purchase-
    cadence statistics (avg/median/max days between orders).  Gap
    values are exact integer day counts, so the avg is an exact
    rational and the median rides the validated percentile ≙
    quantile_cont parity."""
    e = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = e.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        F.round(F.percentile("gap_days", 0.5), 4).alias("median_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
    )


@query(
    "timeseries_gap_fill_ffill",
    "window/timeseries",
    oracle="""
    WITH users AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 20
    ), days AS (
        SELECT CAST(unnest(generate_series(DATE '1997-01-01',
                                           DATE '1997-03-31',
                                           INTERVAL 1 DAY)) AS DATE) AS day
    ), daily AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                    AS DECIMAL(38,4)) AS total
        FROM orders
        WHERE o_custkey < 20
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT u.o_custkey AS custkey, d.day,
           CAST(last_value(t.total IGNORE NULLS) OVER (
               PARTITION BY u.o_custkey ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS total_ffill
    FROM users u
    CROSS JOIN days d
    LEFT JOIN daily t ON t.o_custkey = u.o_custkey AND t.day = d.day
    """,
)
def timeseries_gap_fill_ffill(spark, sf_dir):
    """Resample-to-grid gap filling: densify each entity's sparse daily
    series onto a complete date spine, then forward-fill
    (last-observation-carried-forward) — the standard
    feature-engineering step before any rolling computation that
    assumes a gapless grid.  Composition of three covered primitives:
    generated date spine x entity dim (both broadcast-small — the
    spine is |days| rows regardless of fact volume), a left join
    against the aggregated facts (shuffles only the AGGREGATED daily
    rows, never raw orders), and the IGNORE-NULLS window
    (`window_ignore_nulls`) per entity.  Per-entity window partitions
    are |days| rows — bounded by the grid, not the data, so no skewed
    or giant partition exists at any fact scale.  Totals go through
    DECIMAL(18,4)->(38,4) on both sides (§7.3-H2); NULL before an
    entity's first observation is preserved (no zero-fill) and
    hash-compared."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    users = o.select("o_custkey").distinct()
    days = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(DATE '1997-01-01', DATE '1997-03-31',"
                " interval 1 day)"
            )
        ).alias("day")
    )
    daily = (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .groupBy(
            "o_custkey", F.to_date("o_orderdate").alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("total")
        )
    )
    grid = users.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["o_custkey", "day"], "left")
        .select(
            F.col("o_custkey").alias("custkey"),
            "day",
            F.last("total", ignorenulls=True).over(w).cast("double")
            .alias("total_ffill"),
        )
    )


@query(
    "funnel_conversion_steps",
    "window/analytics",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us
        FROM events
    ), v AS (
        SELECT user_id, min(us) AS t_view
        FROM ev WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(us) AS t_click
        FROM ev e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.us > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(us) AS t_buy
        FROM ev e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.us > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
)
def funnel_conversion_steps(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase): a user
    advances a stage only with a strictly-later event of the next
    type — the product-analytics staple that naive type-counting gets
    wrong (a purchase BEFORE the first view must not count).

    Scale shape: three per-user min-aggregations, each shuffling on
    the same user_id key (AQE reuses the partitioning), with the
    stage frontier joined back per user — per-stage state is one
    timestamp per user, never the event list, so 100 TB of events
    reduce to |users|-sized intermediates after the first aggregate.
    Strictly-increasing µs comparisons are exact integers on both
    engines (no timestamp arithmetic seams)."""
    e = table(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts_us")).alias("us"),
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("us").alias("t_buy"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "cohort_retention_weekly",
    "window/analytics",
    oracle="""
    WITH signups AS (
        SELECT user_id,
               CAST(min(date_trunc('week', ts::TIMESTAMP)) AS TIMESTAMP)
                   AS cohort_week
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               CAST(date_trunc('week', e.ts::TIMESTAMP) AS TIMESTAMP)
                   AS active_week
        FROM events e
    )
    SELECT s.cohort_week,
           CAST(date_diff('day', s.cohort_week::TIMESTAMP,
                          a.active_week::TIMESTAMP) // 7 AS INT)
               AS week_offset,
           CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_active_users
    FROM signups s JOIN activity a ON s.user_id = a.user_id
    WHERE a.active_week >= s.cohort_week
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort retention: users cohorted by the ISO week of
    their first signup, counted as active in each subsequent week
    they produce ANY event — the retention-matrix shape every growth
    dashboard is built on.

    Scale shape: the (user, week) activity dedup collapses raw event
    volume before any join (events reduce to at most
    |users| x |weeks| rows); the signup frontier is one row per user;
    the final matrix is |cohorts| x |offsets| — tiny.  Both shuffles
    ride user_id.  Week bucketing is date_trunc('week') (ISO Monday)
    on both engines; the offset is an exact integer day-diff // 7."""
    e = table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", "ts_us")).alias("cohort_week"))
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts_us").alias("active_week")
    ).distinct()
    return (
        signups.join(activity, "user_id")
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.datediff(F.to_date("active_week"), F.to_date("cohort_week"))
             / F.lit(7)).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )
