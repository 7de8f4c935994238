"""Property-based differential testing (SURVEY §5.2-4c): hypothesis
generates filter predicates from a dialect-shared grammar; Spark and
DuckDB must agree on count + integer-key sum for every one."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.filterwarnings("ignore")

STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@st.composite
def predicates(draw) -> str:
    """A predicate over ``orders`` valid in both SQL dialects."""

    def leaf() -> str:
        kind = draw(st.integers(0, 3))
        if kind == 0:
            op = draw(st.sampled_from([">", "<", ">=", "<=", "="]))
            v = draw(st.integers(1_000, 500_000))
            return f"o_totalprice {op} {v}"
        if kind == 1:
            s = draw(st.sampled_from(STATUSES))
            return f"o_orderstatus = '{s}'"
        if kind == 2:
            ps = draw(st.lists(st.sampled_from(PRIORITIES), min_size=1,
                               max_size=3, unique=True))
            inlist = ", ".join(f"'{p}'" for p in ps)
            return f"o_orderpriority IN ({inlist})"
        y = draw(st.integers(1995, 2001))
        op = draw(st.sampled_from([">=", "<"]))
        return f"o_orderdate {op} TIMESTAMP '{y}-06-01'"

    a, b = leaf(), leaf()
    joiner = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.booleans())
    pred = f"({a}) {joiner} ({b})"
    return f"NOT ({pred})" if neg else pred


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_generated_filters_agree(pred, spark, oracle, sf_dir):
    from datastore_mapper_spark.catalog import load_tables

    load_tables(spark, sf_dir)  # registers the orders view
    sql = (
        "SELECT count(*) AS cnt, "
        "coalesce(CAST(sum(o_orderkey) AS BIGINT), 0) AS key_sum "
        f"FROM orders WHERE {pred}"
    )
    s = spark.sql(sql).collect()[0]
    o = oracle.execute(sql).fetchone()
    assert (s.cnt, s.key_sum) == (o[0], o[1]), pred


GROUP_KEYS = ["o_orderstatus", "o_orderpriority", "year(o_orderdate)"]
AGGS = [
    "count(*)",
    "CAST(sum(o_orderkey) AS BIGINT)",
    "CAST(min(o_orderkey) AS BIGINT)",
    "CAST(max(o_orderkey) AS BIGINT)",
    # H2 armor: double sum/avg differ in the last ulp across engines and
    # can cross a rounding boundary (found by hypothesis: year-2001 avg
    # .86975 vs .86985) — sum exact decimals, derive avg from that.
    # ...and round() itself tie-breaks differently on the two engines
    # (HALF_UP BigDecimal vs rint), so no double round() at all here:
    # the decimal sum IS the comparison value.
    "sum(CAST(o_totalprice AS DECIMAL(18,2)))",
]


@st.composite
def groupby_queries(draw) -> str:
    keys = draw(st.lists(st.sampled_from(GROUP_KEYS), min_size=1,
                         max_size=2, unique=True))
    aggs = draw(st.lists(st.sampled_from(AGGS), min_size=1,
                         max_size=3, unique=True))
    key_list = ", ".join(keys)
    agg_list = ", ".join(
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    )
    having = draw(st.booleans())
    h = " HAVING count(*) > 5" if having else ""
    return (
        f"SELECT CAST({keys[0]} AS STRING) AS k0, {agg_list} "
        f"FROM orders GROUP BY {key_list}{h}"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=groupby_queries())
def test_generated_groupbys_agree(q, spark, oracle, sf_dir):
    """Generated GROUP BY/HAVING aggregates must agree row-for-row
    (sorted canonical compare; totalprice sums rounded to 2 dp)."""
    from datastore_mapper_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    # DuckDB renders CAST AS STRING as VARCHAR; same text works in both
    s = sorted(
        tuple(str(x) for x in r)
        for r in spark.sql(q).collect()
    )
    o = sorted(
        tuple(str(x) for x in r) for r in oracle.execute(q).fetchall()
    )
    assert s == o, q


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
JOIN_KINDS = ["JOIN", "LEFT JOIN", "SEMI", "ANTI"]


@st.composite
def join_queries(draw) -> str:
    """customer⋈orders with generated filters/join kinds — exact
    (integer/count) outputs only, per the round() tie-break finding."""
    kind = draw(st.sampled_from(JOIN_KINDS))
    seg = draw(st.sampled_from(SEGMENTS))
    v = draw(st.integers(50_000, 400_000))
    cust_filter = f"c.c_mktsegment = '{seg}'"
    order_filter = f"o.o_totalprice > {v}"
    if kind == "SEMI":
        return (
            "SELECT count(*) AS cnt, "
            "coalesce(CAST(sum(c.c_custkey) AS BIGINT), 0) AS key_sum "
            f"FROM customer c WHERE {cust_filter} AND c.c_custkey IN "
            f"(SELECT o_custkey FROM orders o WHERE {order_filter})"
        )
    if kind == "ANTI":
        return (
            "SELECT count(*) AS cnt, "
            "coalesce(CAST(sum(c.c_custkey) AS BIGINT), 0) AS key_sum "
            f"FROM customer c WHERE {cust_filter} AND NOT EXISTS "
            f"(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            f"AND {order_filter})"
        )
    on = "c.c_custkey = o.o_custkey"
    if kind == "LEFT JOIN":
        # filter belongs in the ON clause for outer joins
        return (
            "SELECT count(*) AS cnt, "
            "coalesce(CAST(sum(o.o_orderkey) AS BIGINT), 0) AS key_sum "
            f"FROM customer c LEFT JOIN orders o ON {on} AND {order_filter} "
            f"WHERE {cust_filter}"
        )
    return (
        "SELECT count(*) AS cnt, "
        "coalesce(CAST(sum(o.o_orderkey) AS BIGINT), 0) AS key_sum "
        f"FROM customer c JOIN orders o ON {on} "
        f"WHERE {cust_filter} AND {order_filter}"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=join_queries())
def test_generated_joins_agree(q, spark, oracle, sf_dir):
    from datastore_mapper_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    s = spark.sql(q).collect()[0]
    o = oracle.execute(q).fetchone()
    assert (s.cnt, s.key_sum) == (o[0], o[1]), q


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_star_cc_equals_label_propagation_on_random_graphs(spark, data):
    """Differential property: on arbitrary small graphs, alternating
    large-star/small-star and min-label propagation must produce the
    IDENTICAL (node, cluster_id) labeling — both claim cluster_id =
    min member id of the connected component."""
    from datastore_mapper_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    n_nodes = data.draw(st.integers(4, 30))
    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, n_nodes - 1), st.integers(0, n_nodes - 1)
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=60,
        )
    )
    df = spark.createDataFrame(edges, ["d1", "d2"])
    star = {
        (r.node, r.cluster_id)
        for r in connected_components_star(df).collect()
    }
    prop = {
        (r.node, r.cluster_id) for r in connected_components(df).collect()
    }
    assert star == prop


@given(n=st.integers(1, 2000), k=st.integers(1, 16))
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ntile_arithmetic_matches_python_reference(n: int, k: int):
    """Property: ntile_from_row_number's integer arithmetic equals the
    SQL-standard ntile definition (bucket sizes differ by at most one,
    larger buckets first) for arbitrary n and k — pure-Python twin, no
    Spark session needed so hypothesis can afford many examples."""

    def reference(rn: int) -> int:
        if n < k:
            return rn
        q, r = divmod(n, k)
        big_span = r * (q + 1)
        if rn <= big_span:
            return -(-rn // (q + 1))
        return r + -(-(rn - big_span) // q)

    # mirror of the Column expression in operators/scale.py
    def column_mirror(rn: int) -> int:
        q = int(n / k)
        r = n - q * k
        big_span = r * (q + 1)
        ceil_div = lambda a, b: int((a + b - 1) / b)  # noqa: E731
        if n < k:
            return rn
        if rn <= big_span:
            return ceil_div(rn, q + 1)
        return r + ceil_div(rn - big_span, q)

    sizes = [0] * (k + n)
    for rn in range(1, n + 1):
        b = reference(rn)
        assert column_mirror(rn) == b
        sizes[b] += 1
    filled = [s for s in sizes if s]
    # SQL ntile invariants
    assert sum(filled) == n
    assert max(filled) - min(filled) <= 1


@given(data=st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ranged_running_sum_property(spark, data):
    """Differential property (round-5 VERDICT item 7): the two-pass
    range-partitioned prefix sum — inclusive AND exclusive — must equal
    the plain python prefix sum over the total order, for arbitrary
    values (negatives, duplicates of the order key broken by a unique
    id) and arbitrary partition counts."""
    from pyspark.sql import functions as F

    from datastore_mapper_spark.operators.scale import ranged_running_sum

    n = data.draw(st.integers(1, 120))
    vals = data.draw(
        st.lists(
            st.tuples(st.integers(-50, 50), st.integers(-10**6, 10**6)),
            min_size=n, max_size=n,
        )
    )
    nparts = data.draw(st.integers(1, 9))
    exclusive = data.draw(st.booleans())
    rows = [(i, k, v) for i, (k, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid long, k long, v long")
    got = {
        r.uid: r.out
        for r in ranged_running_sum(
            df,
            [F.asc("k"), F.asc("uid")],
            "v",
            "out",
            num_partitions=nparts,
            exclusive=exclusive,
        ).collect()
    }
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    acc, want = 0, {}
    for uid, _, v in ordered:
        if exclusive:
            want[uid] = acc
            acc += v
        else:
            acc += v
            want[uid] = acc
    assert got == want


@given(data=st.data())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_jaccard_prefix_filter_is_lossless_property(spark, data):
    """Differential property: prefix+size filtering must find EXACTLY
    the brute-force all-pairs Jaccard >= theta set on arbitrary small
    corpora — including adversarial shapes (identical docs, singleton
    docs, docs sharing only common tokens) and several thresholds."""
    from pyspark.sql import functions as F

    from datastore_mapper_spark.operators.dedup import (
        jaccard_prefix_candidates,
    )

    vocab = data.draw(st.integers(3, 12))
    n_docs = data.draw(st.integers(2, 14))
    docs = [
        (
            i,
            sorted(
                data.draw(
                    st.sets(
                        st.integers(0, vocab - 1), min_size=1,
                        max_size=vocab,
                    )
                )
            ),
        )
        for i in range(n_docs)
    ]
    num, den = data.draw(st.sampled_from([(4, 5), (1, 2), (2, 3), (9, 10)]))

    doc_toks = spark.createDataFrame(
        [(i, [f"t{t}" for t in toks]) for i, toks in docs],
        "doc_id long, toks array<string>",
    )
    scored = jaccard_prefix_candidates(doc_toks, num, den)
    got = {
        (r.d1, r.d2)
        for r in scored.filter(
            F.col("inter") * den
            >= (F.col("sz1") + F.col("sz2") - F.col("inter")) * num
        ).collect()
    }
    want = set()
    for i, (d1, t1) in enumerate(docs):
        for d2, t2 in docs[i + 1:]:
            s1, s2 = set(t1), set(t2)
            inter = len(s1 & s2)
            if inter * den >= len(s1 | s2) * num:
                want.add((d1, d2))
    assert got == want


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_df_cap_miss_characterization_property(spark, data):
    """Property: capped_jaccard_pairs finds exactly the qualifying
    pairs that share at least one sub-cap token — a qualifying pair is
    missed IFF every shared token is above-cap — on arbitrary corpora
    and caps."""
    from pyspark.sql import functions as F

    from datastore_mapper_spark.operators.dedup import capped_jaccard_pairs

    vocab = data.draw(st.integers(3, 10))
    n_docs = data.draw(st.integers(2, 12))
    docs = [
        (
            i,
            sorted(
                data.draw(
                    st.sets(st.integers(0, vocab - 1), min_size=1,
                            max_size=vocab)
                )
            ),
        )
        for i in range(n_docs)
    ]
    cap = data.draw(st.integers(1, n_docs))

    from collections import Counter

    dfreq = Counter(t for _, toks in docs for t in toks)
    want = set()
    for x, (d1, t1) in enumerate(docs):
        for d2, t2 in docs[x + 1:]:
            s1, s2 = set(t1), set(t2)
            shared = s1 & s2
            inter = len(shared)
            if not shared or inter * 5 < len(s1 | s2) * 4:
                continue  # not a qualifying pair (theta = 4/5)
            if any(dfreq[t] <= cap for t in shared):
                want.add((d1, d2))  # at least one sub-cap shared token

    doc_toks = spark.createDataFrame(
        [(i, [f"t{t}" for t in toks]) for i, toks in docs],
        "doc_id long, toks array<string>",
    )
    got = {
        (r.d1, r.d2)
        for r in capped_jaccard_pairs(doc_toks, cap)
        .filter(
            F.col("inter") * 5
            >= (F.col("sz1") + F.col("sz2") - F.col("inter")) * 4
        )
        .collect()
    }
    assert got == want


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_skewsafe_property(spark, data):
    """Property: the two-level (user, bucket) sessionization equals the
    single-pass lag->cumsum sessionization on arbitrary event sets —
    including timestamps at exact bucket boundaries and exact-gap
    spacings that sit on the merge rule's decision edge."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    import datastore_mapper_spark.queries.stream_batch as sb

    gap, bucket = sb._GAP_US, sb._BUCKET_US
    n = data.draw(st.integers(1, 60))
    rows = []
    for eid in range(n):
        user = data.draw(st.integers(0, 3))
        # timestamps biased to land on bucket/gap multiples
        base = data.draw(st.integers(0, 8)) * bucket
        off = data.draw(
            st.sampled_from([0, 1, gap - 1, gap, gap + 1, bucket - 1])
        )
        rows.append((user, eid, base + off))
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")

    def plain():
        order = Window.partitionBy("user_id").orderBy("us", "event_id")
        flagged = df.withColumn("prev_us", F.lag("us").over(order)).withColumn(
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

    def skewsafe():
        w_in = Window.partitionBy("user_id", "bucket").orderBy(
            "us", "event_id"
        )
        base = df.withColumn("bucket", F.floor(F.col("us") / bucket))
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

    assert {tuple(r) for r in skewsafe().collect()} == {
        tuple(r) for r in plain().collect()
    }


@given(data=st.data())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_overlap_join_exactly_once_property(spark, data):
    """Differential property (round 6, hardened round 7): the
    cell-replicated overlap join with responsibility-cell dedup must
    emit EXACTLY the naive quadratic overlap set, exactly once per
    pair, for arbitrary integer intervals — including zero-length
    intervals, nested intervals, identical intervals, pairs sharing
    many cells (the case where a missing responsibility filter would
    duplicate), AND endpoints that are NOT phase-aligned multiples of
    the grid step (round-6 ADVICE: the pre-normalization operator
    silently dropped such pairs)."""
    from datastore_mapper_spark.operators.scale import interval_overlap_join

    n1 = data.draw(st.integers(1, 25))
    n2 = data.draw(st.integers(1, 25))
    step = data.draw(st.integers(1, 7))  # >1 makes misalignment likely

    def intervals(n):
        out = []
        for i in range(n):
            s = data.draw(st.integers(0, 30))
            ln = data.draw(st.integers(0, 12))
            out.append((i, s, s + ln))
        return out

    left = intervals(n1)
    right = intervals(n2)
    lhs = spark.createDataFrame(left, "k1 long, s1 long, e1 long")
    rhs = spark.createDataFrame(right, "k2 long, s2 long, e2 long")
    got = sorted(
        (r.k1, r.k2)
        for r in interval_overlap_join(lhs, rhs, step=str(step))
        .select("k1", "k2")
        .collect()
    )
    want = sorted(
        (k1, k2)
        for k1, s1, e1 in left
        for k2, s2, e2 in right
        if s1 <= e2 and s2 <= e1
    )
    assert got == want  # set equality AND multiplicity (exactly-once)


def test_interval_overlap_join_timestamp_misaligned(spark):
    """Timestamp mode with endpoints that are NOT day-aligned (odd
    hours/minutes) against a 1-DAY grid: the pmod normalization must
    keep every overlapping pair.  Before round 7 this dropped pairs
    whose responsibility bucket never appeared in the other side's
    raw-endpoint sequence."""
    from datetime import datetime, timedelta

    from datastore_mapper_spark.operators.scale import interval_overlap_join

    base = datetime(2024, 3, 1)
    left = [
        (i, base + timedelta(hours=h), base + timedelta(hours=h + ln))
        for i, (h, ln) in enumerate(
            [(3, 30), (11, 0), (26, 50), (49, 5), (0, 24), (7, 100)]
        )
    ]
    right = [
        (i, base + timedelta(hours=h, minutes=17),
         base + timedelta(hours=h + ln, minutes=17))
        for i, (h, ln) in enumerate(
            [(2, 10), (25, 2), (40, 40), (5, 0), (71, 30)]
        )
    ]
    lhs = spark.createDataFrame(left, "k1 long, s1 timestamp, e1 timestamp")
    rhs = spark.createDataFrame(right, "k2 long, s2 timestamp, e2 timestamp")
    got = sorted(
        (r.k1, r.k2)
        for r in interval_overlap_join(lhs, rhs, step="INTERVAL 1 DAY")
        .select("k1", "k2")
        .collect()
    )
    want = sorted(
        (k1, k2)
        for k1, s1, e1 in left
        for k2, s2, e2 in right
        if s1 <= e2 and s2 <= e1
    )
    assert got == want and len(want) > 0


def test_interval_overlap_join_rejects_variable_length_step():
    """MONTH/YEAR grids have no fixed length — the operator must fail
    loudly instead of floor-dividing a lie."""
    from datastore_mapper_spark.operators.scale import interval_overlap_join

    with pytest.raises(ValueError, match="fixed-length"):
        interval_overlap_join(None, None, step="INTERVAL 1 MONTH")


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_band_equi_join_boundary_property(spark, data):
    """Differential property (round-6 VERDICT task 6): band_equi_join's
    bucket-exploded equi formulation must equal the naive theta join
    ``r ∈ [l, l + band]`` for arbitrary second-precision timestamps —
    endpoints deliberately NOT bucket-aligned, band boundaries landing
    exactly on and just off right-side points."""
    from datetime import datetime, timedelta

    from datastore_mapper_spark.operators.scale import band_equi_join

    base = datetime(2024, 5, 1)
    band_units = data.draw(st.integers(1, 3))
    bucket = data.draw(st.sampled_from(["hour", "day"]))
    n1 = data.draw(st.integers(1, 15))
    n2 = data.draw(st.integers(1, 15))
    span = 5 * (3600 if bucket == "hour" else 86400)

    def points(n):
        return [
            (i, base + timedelta(seconds=data.draw(st.integers(0, span))))
            for i in range(n)
        ]

    left = points(n1)
    right = points(n2)
    lhs = spark.createDataFrame(left, "k1 long, t1 timestamp")
    rhs = spark.createDataFrame(right, "k2 long, t2 timestamp")
    got = sorted(
        (r.k1, r.k2)
        for r in band_equi_join(lhs, rhs, "t1", "t2", band_units, bucket)
        .select("k1", "k2")
        .collect()
    )
    width = timedelta(**{f"{bucket}s": band_units})
    want = sorted(
        (k1, k2)
        for k1, t1 in left
        for k2, t2 in right
        if t1 <= t2 <= t1 + width
    )
    assert got == want


@given(data=st.data())
@settings(max_examples=25, deadline=None)
def test_codec_roundtrip_property(data):
    """Random-shape, random-content roundtrips for every real codec:
    encode->decode must be the identity for arbitrary uint8/int16
    payloads — paddings, extreme values, 1-pixel/1-sample degenerates."""
    import numpy as np

    from datastore_mapper_spark.operators import multimodal as mm

    kind = data.draw(st.sampled_from(["bmp", "ppm", "wav", "y4m"]))
    if kind in ("bmp", "ppm"):
        h = data.draw(st.integers(1, 9))
        w = data.draw(st.integers(1, 9))
        px = np.array(
            data.draw(
                st.lists(st.integers(0, 255), min_size=h * w * 3,
                         max_size=h * w * 3)
            ),
            dtype=np.uint8,
        ).reshape(h, w, 3)
        enc = mm.encode_bmp24 if kind == "bmp" else mm.encode_ppm
        dec = mm.decode_bmp24 if kind == "bmp" else mm.decode_ppm
        ww, hh, back = dec(enc(px))
        assert (ww, hh) == (w, h) and (back == px).all()
    elif kind == "wav":
        n = data.draw(st.integers(1, 40))
        samples = np.array(
            data.draw(st.lists(st.integers(-32768, 32767), min_size=n,
                               max_size=n)),
            dtype=np.int16,
        )
        sr = data.draw(st.sampled_from([8000, 16000, 44100]))
        got_sr, back = mm.decode_wav_pcm16(mm.encode_wav_pcm16(samples, sr))
        assert got_sr == sr and (back == samples).all()
    else:
        n = data.draw(st.integers(1, 4))
        h = data.draw(st.integers(1, 5))
        w = data.draw(st.integers(1, 5))
        frames = np.array(
            data.draw(st.lists(st.integers(0, 255), min_size=n * h * w * 3,
                               max_size=n * h * w * 3)),
            dtype=np.uint8,
        ).reshape(n, h, w, 3)
        ww, hh, back = mm.decode_y4m(mm.encode_y4m(frames))
        assert (ww, hh) == (w, h) and (back == frames).all()


@given(
    word=st.text(alphabet="abcd", min_size=0, max_size=24),
    a=st.sampled_from("abcd"),
    b=st.sampled_from("abcd"),
)
@settings(max_examples=200, deadline=None)
def test_bpe_merge_symbols_properties(word, a, b):
    """The BPE merge primitive's invariants, property-tested:
    concatenating the merged symbols reproduces the word exactly
    (merging never drops or reorders characters), the sequence never
    grows, and no adjacent (a, b) pair survives a greedy left-to-right
    pass UNLESS it was re-created by the merge itself (possible only
    when a == b + something — for single chars, when the merged token
    ends in a and is followed by b after an odd run)."""
    from datastore_mapper_spark.queries.bpe_queries import _merge_symbols

    merged = _merge_symbols(list(word), a, b)
    assert "".join(merged) == word
    assert len(merged) <= len(word)
    # greedy left-to-right: among ORIGINAL single chars, no adjacent
    # (a, b) pair remains
    for x, y in zip(merged, merged[1:]):
        assert not (x == a and y == b)


# --- round 13: codec round-trip properties (hypothesis-shrunk) --------

@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    kind=st.sampled_from(["random", "palette", "runs"]),
)
def test_qoi_round_trip_property(h, w, seed, kind):
    """∀ images: decode(encode(px)) == px — hypothesis drives the
    shapes and content classes and SHRINKS any failure to a minimal
    image (the fixed-seed fuzz in test_operators pins known corpora;
    this pins the law itself)."""
    import numpy as np

    from datastore_mapper_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.RandomState(seed)
    if kind == "random":
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    elif kind == "palette":
        pal = rng.randint(0, 256, (3, 3)).astype(np.uint8)
        px = pal[rng.randint(0, 3, (h, w))]
    else:
        px = np.repeat(rng.randint(0, 256, (h, 1, 3)), w, axis=1) \
            .astype(np.uint8)
    assert (decode_qoi(encode_qoi(px)) == px).all()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(0, 600),
    seed=st.integers(0, 2**31 - 1),
    kind=st.sampled_from(["noise", "ramp", "const", "steps"]),
)
def test_flac_round_trip_property(n, seed, kind):
    """∀ mono int16 signals: decode(encode(sig)) == sig with all three
    integrity layers verified — covers every fixed-predictor order,
    Rice parameter and the empty/1-sample edges via shrinking."""
    import numpy as np

    from datastore_mapper_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(seed)
    if kind == "noise":
        sig = rng.randint(-32768, 32767, n).astype(np.int16)
    elif kind == "ramp":
        sig = (rng.randint(-5000, 5000)
               + rng.randint(-20, 20) * np.arange(n)).astype(np.int16)
    elif kind == "const":
        sig = np.full(n, rng.randint(-32768, 32767), np.int16)
    else:
        sig = np.repeat(rng.randint(-1000, 1000, max(1, n // 50 + 1)),
                        50)[:n].astype(np.int16)
    out, sr = decode_flac(encode_flac(sig, 8000))
    assert sr == 8000 and len(out) == n and (out == sig).all()


def test_pacf_cramer_expansion_matches_durbin_levinson():
    """pacf_yule_walker_daily's closed Cramer-rule forms (lags 1-3)
    must equal the Durbin-Levinson recursion on the same ACF values
    — the symbolic determinant expansions are easy to get wrong by
    one sign (round 16)."""
    import numpy as np

    def durbin_levinson(r):
        # r = [r1, r2, r3, ...]; returns [phi11, phi22, phi33, ...]
        phis, prev = [], []
        for k in range(1, len(r) + 1):
            if k == 1:
                phi_kk = r[0]
                prev = [phi_kk]
            else:
                num = r[k - 1] - sum(prev[j] * r[k - 2 - j]
                                     for j in range(k - 1))
                den = 1 - sum(prev[j] * r[j] for j in range(k - 1))
                phi_kk = num / den
                prev = [prev[j] - phi_kk * prev[k - 2 - j]
                        for j in range(k - 1)] + [phi_kk]
            phis.append(phi_kk)
        return phis

    rng = np.random.default_rng(16)
    for _ in range(200):
        # draw a STATIONARY AR(3): scale so sum|phi| < 1 (sufficient)
        a = rng.uniform(-1.0, 1.0, size=3)
        a *= rng.uniform(0.1, 0.9) / np.abs(a).sum()
        # simulate long series, estimate r1..r3
        n = 4000
        x = np.zeros(n)
        eps = rng.normal(size=n)
        for t in range(3, n):
            x[t] = a[0] * x[t - 1] + a[1] * x[t - 2] \
                + a[2] * x[t - 3] + eps[t]
        xc = x - x.mean()
        c0 = float(xc @ xc)
        r = [float(xc[:-k] @ xc[k:]) / c0 for k in (1, 2, 3)]
        r1, r2, r3 = r
        want = durbin_levinson(r)
        got2 = (r2 - r1 * r1) / (1 - r1 * r1)
        got3 = ((r3 - 2 * r1 * r2 - r1 * r1 * r3
                 + r1 * r2 * r2 + r1 ** 3)
                / (1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 - r2 * r2))
        assert abs(want[0] - r1) < 1e-12
        assert abs(want[1] - got2) < 1e-10, (r, want[1], got2)
        assert abs(want[2] - got3) < 1e-10, (r, want[2], got3)


def test_krippendorff_collapsed_form_matches_generic():
    """krippendorff_alpha_quality_gates collapses the nominal-metric
    coincidence-matrix alpha (binary categories, m raters, no
    missing) to 1 - dis*(T-1)/(2*y*(T-y)).  Verify against a generic
    coincidence-matrix implementation over random rating tables."""
    import numpy as np

    def generic_alpha(units):
        # units: list of per-unit category lists (no missing)
        cats = sorted({c for u in units for c in u})
        idx = {c: i for i, c in enumerate(cats)}
        k = len(cats)
        o = np.zeros((k, k))
        for u in units:
            m = len(u)
            if m < 2:
                continue
            counts = np.zeros(k)
            for c in u:
                counts[idx[c]] += 1
            for a in range(k):
                for b in range(k):
                    if a == b:
                        o[a, b] += counts[a] * (counts[a] - 1) / (m - 1)
                    else:
                        o[a, b] += counts[a] * counts[b] / (m - 1)
        nc = o.sum(axis=1)
        T = nc.sum()
        d_o = sum(o[a, b] for a in range(k) for b in range(k) if a != b)
        d_e = sum(nc[a] * nc[b] for a in range(k) for b in range(k)
                  if a != b) / (T - 1)
        return 1 - d_o / d_e

    rng = np.random.default_rng(16)
    for _ in range(100):
        n = int(rng.integers(3, 60))
        n1s = rng.integers(0, 4, size=n)          # yes-count per unit
        if n1s.sum() in (0, 3 * n):
            continue                               # guarded degenerate
        units = [[1] * int(x) + [0] * (3 - int(x)) for x in n1s]
        want = generic_alpha(units)
        y = int(n1s.sum())
        dis = int(sum(x * (3 - x) for x in n1s))
        got = 1 - dis * (3 * n - 1) / (2.0 * y * (3 * n - y))
        assert abs(want - got) < 1e-12, (n, y, dis, want, got)


def test_nsw_beam_recall_and_connectivity():
    """nsw graph-ANN kernel (round 16): (a) beam search with ef=n is
    EXACT — the insertion-order NSW graph stays connected, so an
    exhaustive beam visits every node; (b) recall@10 at the
    production ef=48 stays >= 0.85 on unit-sphere fixtures (the
    hardest geometry for ANN)."""
    import numpy as np

    from datastore_mapper_spark.operators.similarity import (
        _nsw_beam,
        _nsw_build,
    )

    rng = np.random.default_rng(16)
    for n in (120, 600):
        X = rng.normal(size=(n, 64))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        adj = _nsw_build(X, m=8, ef_c=48)
        recalls = []
        for _ in range(25):
            q = rng.normal(size=64)
            q /= np.linalg.norm(q)
            exact = set(np.argsort(-(X @ q), kind="stable")[:10].tolist())
            full = sorted(_nsw_beam(X, adj, 0, q, n), reverse=True)[:10]
            assert {i for _, i in full} == exact  # ef=n ⇒ exhaustive
            fast = sorted(_nsw_beam(X, adj, 0, q, 48), reverse=True)[:10]
            recalls.append(len(exact & {i for _, i in fast}) / 10.0)
        assert sum(recalls) / len(recalls) >= 0.85, (n, recalls)


def test_anderson_darling_doubled_form_matches_reference():
    """anderson_darling_k_sample folds the half-integer midrank
    quantities B_j, M_ij of Scholz-Stephens' ties-adjusted A2akN into
    doubled integers (b=2B, m=2M) with the algebra l·(N·m−n_i·b)² /
    (n_i·N·(b(2N−b)−N·l)).  Verify the folded form against a direct
    half-integer implementation of eq. (6) on random tied samples
    (round 16)."""
    import numpy as np

    def a2akn_reference(samples):
        # samples: list of 1-D int arrays
        pooled = np.concatenate(samples)
        N = len(pooled)
        zs = np.unique(pooled)
        total = 0.0
        for xi in samples:
            ni = len(xi)
            inner = 0.0
            cum_all = 0.0
            cum_i = 0.0
            for z in zs:
                lj = float((pooled == z).sum())
                lij = float((xi == z).sum())
                Bj = cum_all + lj / 2.0
                Mij = cum_i + lij / 2.0
                den = Bj * (N - Bj) - N * lj / 4.0
                inner += (lj / N) * (N * Mij - ni * Bj) ** 2 / den
                cum_all += lj
                cum_i += lij
            total += inner / ni
        return (N - 1) / N * total

    def a2akn_doubled(samples):
        pooled = np.concatenate(samples)
        N = len(pooled)
        zs = np.unique(pooled)
        l = np.array([(pooled == z).sum() for z in zs], dtype=np.int64)
        b = 2 * np.cumsum(l) - l
        total = 0.0
        for xi in samples:
            ni = len(xi)
            lij = np.array([(xi == z).sum() for z in zs], dtype=np.int64)
            m = 2 * np.cumsum(lij) - lij
            num = (N * m - ni * b).astype(np.float64) ** 2
            den = (b * (2 * N - b) - N * l).astype(np.float64)
            total += float((l * num / (ni * N * den)).sum())
        return (N - 1) / N * total

    rng = np.random.default_rng(16)
    for _ in range(50):
        k = int(rng.integers(2, 5))
        samples = [rng.integers(0, 12, size=int(rng.integers(5, 40)))
                   for _ in range(k)]
        if len(np.unique(np.concatenate(samples))) < 2:
            continue
        want = a2akn_reference(samples)
        got = a2akn_doubled(samples)
        assert abs(want - got) < 1e-10, (want, got)


def test_mmr_greedy_properties():
    """mmr_greedy (round 16): (a) lambda=1 reduces to pure relevance
    order; (b) every step's pick brute-force-maximizes the MMR
    objective among remaining candidates (the same invariant the
    graded query re-checks in Spark); (c) input id order does not
    change the selection."""
    import numpy as np

    from datastore_mapper_spark.operators.similarity import mmr_greedy

    rng = np.random.default_rng(16)
    for _ in range(30):
        n = int(rng.integers(5, 15))
        X = rng.normal(size=(n, 16))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        ids = list(rng.choice(1000, size=n, replace=False).astype(int))
        rel = {i: float(rng.uniform(0, 1)) for i in ids}
        pure = mmr_greedy(ids, X, rel, 1.0, 5)
        want = sorted(ids, key=lambda i: (-rel[i], i))[:5]
        assert pure == want
        lam = 0.7
        sel = mmr_greedy(ids, X, rel, lam, 5)
        pos = {i: p for p, i in enumerate(ids)}
        chosen: list[int] = []
        for pick in sel:
            objs = {}
            for i in ids:
                if i in chosen:
                    continue
                pen = max((float(X[pos[i]] @ X[pos[s]]) for s in chosen),
                          default=0.0)
                objs[i] = lam * rel[i] - (1 - lam) * pen
            assert objs[pick] >= max(objs.values()) - 1e-12
            chosen.append(pick)
        shuffled = list(ids)
        rng.shuffle(shuffled)
        assert mmr_greedy(shuffled, X[[pos[i] for i in shuffled]],
                          rel, lam, 5) == sel
