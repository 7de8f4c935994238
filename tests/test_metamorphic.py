"""Metamorphic invariants (SURVEY §5.2-4b): engine-only consistency
checks that need no oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from datastore_mapper_spark.catalog import table


def test_filter_partition_counts(spark, sf_dir):
    """count(P) + count(NOT P) == count(*) for a null-free predicate."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice") > 200000
    assert o.filter(p).count() + o.filter(~p).count() == o.count()


def test_union_all_additivity(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_custkey") <= 60)
    hi = c.filter(F.col("c_custkey") > 60)
    assert lo.unionAll(hi).count() == c.count()


def test_semi_join_containment(spark, sf_dir):
    """semi-join results ⊆ distinct inner-join left keys, and equal."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    inner = (
        c.join(o, c.c_custkey == o.o_custkey).select("c_custkey").distinct()
    )
    assert semi.count() == inner.count()
    assert semi.subtract(inner).count() == 0


def test_anti_semi_partition(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    assert semi + anti == c.count()


def test_rollup_total_matches_global(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    rolled = (
        li.rollup("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("l_returnflag").isNull())
        .collect()
    )
    assert rolled[0].cnt == li.count()


def test_topk_is_prefix_of_sorted(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    full = [
        r.o_orderkey
        for r in o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey")
        .collect()
    ]
    top = [
        r.o_orderkey
        for r in o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
        .select("o_orderkey")
        .collect()
    ]
    assert top == full[:50]


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    """Metamorphic: packing must move every token into exactly one bin —
    Σ per-bin token sums equals the corpus token count, and every bin
    except possibly the last is filled past the budget boundary's
    predecessor (no silently dropped or duplicated docs)."""
    from pyspark.sql import functions as F

    from datastore_mapper_spark.catalog import table
    from datastore_mapper_spark.registry import all_queries

    spec = all_queries()["pack_sequences_token_budget"]
    bins = spec.fn(spark, sf_dir).collect()
    d = table(spark, sf_dir, "documents")
    corpus_tokens = d.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).first().s
    assert sum(r.sum_tokens for r in bins) == corpus_tokens
    assert sum(r.n_docs for r in bins) == d.count()


def test_dedup_keep_canonical_partitions_corpus(spark, sf_dir):
    """Metamorphic: canonical docs + non-canonical duplicates must
    partition the corpus — every dropped doc belongs to some cluster
    whose canonical representative IS kept."""
    from datastore_mapper_spark.registry import all_queries

    specs = all_queries()
    kept = {r.doc_id for r in specs["dedup_keep_canonical"].fn(spark, sf_dir).collect()}
    clusters = {
        r.doc_id: r.cluster_id
        for r in specs["dedup_cluster_assign"].fn(spark, sf_dir).collect()
    }
    from datastore_mapper_spark.catalog import table

    all_ids = {
        r.doc_id
        for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    dropped = all_ids - kept
    for doc in dropped:
        assert doc in clusters and clusters[doc] in kept


def test_session_skewsafe_equals_plain_on_mega_user(spark):
    """session_windows_skewsafe must reproduce the single-pass
    sessionization bit-for-bit on a synthetic mega-user whose sessions
    chain across MANY hour buckets (the stitching path the fixture
    barely exercises): 20k events for one user at 5-minute intervals
    form ONE session spanning ~69 hour-buckets, interleaved with burst
    users whose sessions split within buckets."""
    from pyspark.sql import functions as F

    from datastore_mapper_spark.registry import all_queries  # noqa: F401
    import datastore_mapper_spark.queries.stream_batch as sb

    gap = sb._GAP_US
    rows = []
    # mega-user 1: continuous 5-min cadence -> one giant session
    t0 = 1_700_000_000_000_000
    for i in range(20_000):
        rows.append((1, i, t0 + i * 300_000_000))
    # user 2: alternating short gaps and >30min gaps, some exactly ==
    # gap (must NOT split) and gap+1us (must split)
    t = t0
    eid = 100_000
    for i in range(500):
        rows.append((2, eid, t)); eid += 1
        t += gap if i % 3 == 0 else (gap + 1 if i % 3 == 1 else 60_000_000)
    # user 3: one event per hour bucket boundary, exactly gap apart
    # across adjacent buckets
    for i in range(100):
        rows.append((3, eid, t0 + i * gap)); eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")

    def plain(d):
        from pyspark.sql import Window

        order = Window.partitionBy("user_id").orderBy("us", "event_id")
        flagged = d.withColumn("prev_us", F.lag("us").over(order)).withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > gap),
                1,
            ).otherwise(0),
        )
        s = flagged.withColumn(
            "session_id", F.sum("is_new").over(order).cast("long")
        )
        return s.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("span_us"),
        )

    def skewsafe(d):
        from pyspark.sql import Window

        w_in = Window.partitionBy("user_id", "bucket").orderBy(
            "us", "event_id"
        )
        base = d.withColumn("bucket", F.floor(F.col("us") / sb._BUCKET_US))
        local = (
            base.withColumn("prev_us", F.lag("us").over(w_in))
            .withColumn(
                "is_new",
                F.when(
                    F.col("prev_us").isNull()
                    | (F.col("us") - F.col("prev_us") > gap),
                    1,
                ).otherwise(0),
            )
            .withColumn("local_id", F.sum("is_new").over(w_in).cast("long"))
        )
        summaries = local.groupBy("user_id", "bucket").agg(
            F.max("local_id").alias("k"),
            F.min("us").alias("first_us"),
            F.max("us").alias("last_us"),
        )
        w_b = Window.partitionBy("user_id").orderBy("bucket")
        offsets = (
            summaries.withColumn("prev_last", F.lag("last_us").over(w_b))
            .withColumn(
                "merge",
                F.when(
                    (F.col("first_us") - F.col("prev_last")) <= gap, F.lit(1)
                ).otherwise(F.lit(0)),
            )
            .withColumn(
                "offset",
                F.coalesce(
                    F.sum("k").over(
                        w_b.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                - F.sum("merge").over(
                    w_b.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .select("user_id", "bucket", "offset")
        )
        sess = local.join(offsets, ["user_id", "bucket"]).withColumn(
            "session_id", (F.col("offset") + F.col("local_id")).cast("long")
        )
        return sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("span_us"),
        )

    got = {tuple(r) for r in skewsafe(df).collect()}
    want = {tuple(r) for r in plain(df).collect()}
    assert got == want
    # the mega-user collapsed to ONE session despite spanning ~69
    # hour buckets -> the stitching chain worked end to end
    mega = [r for r in want if r[0] == 1]
    assert len(mega) == 1 and mega[0][2] == 20_000


def test_session_skewsafe_plan_bounds_task_input(spark, sf_dir):
    """The row-level window must partition by (user_id, bucket) — the
    per-task bound — with only the one-row-per-bucket summary windows
    partitioned by user alone."""
    import re

    from datastore_mapper_spark.registry import all_queries

    df = all_queries()["session_windows_skewsafe"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    row_level = [s for s in specs if "bucket#" in s and "us#" in s]
    assert row_level, plan  # lag/cumsum windows keyed by (user, bucket)
    for s in row_level:
        assert "user_id#" in s


def test_bm25_cross_engine_rounding_margin(spark, sf_dir):
    """Round-6 ADVICE: bm25_retrieval_topk hash-compares round(x, 4) of
    ln()-derived doubles across DuckDB (libm) and the JVM (Math.log); a
    last-ulp ln divergence could in principle flip a 4-dp rounding or
    the top-20 boundary.  This test turns that latent possibility into
    a MEASURED margin for the graded fixtures: recompute the exact
    scores (un-rounded, in DuckDB) and assert every emitted score sits
    far from its rounding boundary, and the top-20 cut has a wide gap —
    both >> the ~1e-11 scale a 1-ulp ln difference can move a score.
    If a future fixture lands inside the margin, this fails BEFORE the
    driver flakes."""
    import duckdb

    from datastore_mapper_spark.registry import all_queries

    import re

    oracle = all_queries()["bm25_retrieval_topk"].oracle
    raw_sql = re.sub(r",\s*4\)\s*AS bm25", ") AS bm25", oracle)
    raw_sql = raw_sql.replace("round(", "(", 1)
    # sanity: the rewrite really removed the rounding call
    assert "round(" not in raw_sql and "AS bm25" in raw_sql
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    raw_sql_no_limit = raw_sql.replace("LIMIT 20", "LIMIT 25")
    scores = [r[1] for r in con.execute(raw_sql_no_limit).fetchall()]
    assert len(scores) >= 21, "fixture too small to measure the top-20 cut"
    # distance of each reported score from its nearest 4-dp half-way point
    margin = min(abs((abs(s) * 1e4) % 1 - 0.5) for s in scores[:20])
    assert margin > 1e-6, f"score sits {margin} from a 4-dp rounding flip"
    # the top-20 boundary gap (ties broken by doc_id are hash-stable)
    gap = scores[19] - scores[20]
    assert gap == 0.0 or gap > 1e-6, f"top-20 cut gap {gap} is flake-range"


def test_skyline_members_undominated_and_cover(spark, sf_dir):
    """Every skyline row must be undominated against the FULL customer
    relation, and every non-skyline customer must be dominated by
    some skyline member — soundness and completeness of the bucketed
    algorithm checked against the definition itself (not the oracle)."""
    from datastore_mapper_spark.registry import all_queries

    Q = all_queries()
    sky = {
        (r.spend_cents, r.n_orders)
        for r in Q["skyline_pareto_frontier"].fn(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    cust = [
        (r.s, r.n)
        for r in o.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    ]

    def dominated(p, q):  # q dominates p
        return q[0] >= p[0] and q[1] >= p[1] and q != p

    assert sky, "empty skyline"
    for p in sky:
        assert not any(dominated(p, q) for q in cust if (q[0], q[1]) != p), p
    for p in cust:
        if tuple(p) not in sky:
            assert any(dominated(p, q) for q in sky), p


def test_ewma_bounded_by_window_extremes(spark, sf_dir):
    """An EWMA is a convex combination of its window's values, so it
    must lie within [min, max] of the trailing 20 values (in the same
    floored-cents quantization the operator uses) — checked row-by-row
    against a Python recomputation of the windows."""
    import math

    from datastore_mapper_spark.registry import all_queries

    Q = all_queries()
    rows = Q["ewma_dyadic_smoothing"].fn(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    import collections

    hist = collections.defaultdict(list)
    for r in (
        e.select("user_id", "ts_us", "event_id", "value")
        .orderBy("ts_us", "event_id")
        .collect()
    ):
        hist[r.user_id].append(math.floor(r.value * 100) / 100.0)
    for r in rows:
        window = hist[r.user_id][max(0, r.rn - 20): r.rn]
        lo, hi = min(window), max(window)
        assert lo - 1e-9 <= r.ewma <= hi + 1e-9, (r, lo, hi)


def test_containment_pairs_are_true_subsets(spark, sf_dir):
    """Every reported containment pair must have the smaller token set
    literally a subset of the larger (checked in Python sets), and
    jaccard must be < 0.5 by the size identity."""
    from datastore_mapper_spark.registry import all_queries

    Q = all_queries()
    pairs = Q["containment_asymmetric_dedup"].fn(spark, sf_dir).limit(500).collect()
    d = table(spark, sf_dir, "documents")
    toks = {
        r.doc_id: set(r.text.split(" ")) for r in d.collect()
    }
    assert pairs, "no containment pairs"
    for r in pairs:
        a, b = toks[r.d1], toks[r.d2]
        small, big = (a, b) if len(a) <= len(b) else (b, a)
        assert small <= big, (r.d1, r.d2)
        assert len(big) > 2 * len(small), (r.d1, r.d2)
