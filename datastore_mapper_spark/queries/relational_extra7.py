"""Round-1 widening batch 7: TF-IDF ranking, word-bigram shingle
near-dup, interval RANGE frames, encode/bucketing/trig scalar suites.

All six formulations were parity-probed against DuckDB 1.0 at sf0.001
and sf0.01 before registration (_scratch/probe_new_queries.py).
Dialect seams handled here: DuckDB ``sign`` returns an integer (cast to
DOUBLE in the oracle), DuckDB 1.0 lacks ``width_bucket`` (identical
floor arithmetic used on both sides) and ``length(BLOB)``
(``octet_length``), and both engines pin FP outputs with 4-dp rounds
per SURVEY §7.3-H2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "tfidf_top_terms",
    "LLM-pipeline",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
        SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, tok ASC) AS rn
        FROM scored
    )
    SELECT doc_id, tok, tfidf, rn FROM ranked WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document — the classic quality/keyword
    signal for a training-data pipeline.  Scale shape: the document
    frequency table is vocabulary-sized (small), so it broadcasts; the
    term-frequency table shuffles once on ``tok`` for the join and once
    on ``doc_id`` for the window — both keys are high-cardinality and
    unskewed.  The corpus-size scalar is a broadcast cross join, never
    a driver-side ``.count()``.  Score pinned at 4 dp (§7.3-H2) with a
    ``tok`` tie-break so ranking is total (§7.3-H7)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
    )


@query(
    "dedup_bigram_jaccard",
    "LLM-pipeline",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                          i -> list_extract(w, i) || ' ' || list_extract(w, i + 1)))
                   AS g
            FROM toks
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
    ), pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.d1, p.d2,
           round(CAST(p.inter AS DOUBLE) / (s1.sz + s2.sz - p.inter), 4) AS jac
    FROM pairs p
    JOIN sizes s1 ON p.d1 = s1.doc_id
    JOIN sizes s2 ON p.d2 = s2.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (s1.sz + s2.sz - p.inter) >= 0.6
    """,
)
def dedup_bigram_jaccard(spark, sf_dir):
    """Near-duplicate pairs by word-bigram (2-shingle) Jaccard >= 0.6.
    Bigram shingles are far rarer than single tokens, so the
    shared-shingle candidate join stays near-linear where a unigram
    join would square up; at 100 TB the candidate step is replaced by
    MinHash-LSH banding over the same shingles (operators/dedup.py) and
    this exact Jaccard verifies the surviving candidates."""
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 1), "
                    "i -> concat(element_at(split(text, ' '), i), ' ', "
                    "element_at(split(text, ' '), i + 1)))"
                )
            )
        ).alias("g"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("s1.sz") + F.col("s2.sz") - F.col("inter")
    )
    return (
        pairs.join(sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id"))
        .filter(jac >= 0.6)
        .select("d1", "d2", F.round(jac, 4).alias("jac"))
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
    "fn_encode_suite",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name)) AS b64,
           hex(encode(p_name)) AS hx,
           octet_length(encode(p_name)) AS nbytes
    FROM part
    WHERE p_partkey <= 200
    """,
)
def fn_encode_suite(spark, sf_dir):
    """Binary encode suite: base64 / hex / octet_length over UTF-8
    bytes — the plumbing every opaque-binary (multimodal) column rides
    on.  DuckDB needs an explicit ``encode()`` to bytes; Spark casts
    string→binary."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.hex(F.col("p_name")).alias("hx"),
        F.octet_length("p_name").alias("nbytes"),
    )


@query(
    "fn_width_bucket",
    "scalar fn",
    oracle="""
    SELECT CAST(least(12, floor(o_totalprice / 50000.0)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def fn_width_bucket(spark, sf_dir):
    """Equi-width histogram bucketing (width_bucket semantics spelled
    as identical floor arithmetic on both sides — DuckDB 1.0 has no
    ``width_bucket`` builtin).  Map-side partial aggregation collapses
    each partition to <=13 rows before the shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.least(F.lit(12), F.floor(F.col("o_totalprice") / 50000.0))
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "fn_trig_suite",
    "scalar fn",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 4) AS s,
           round(cos(l_discount), 4) AS c,
           round(atan2(l_discount, l_tax + 0.01), 4) AS a2,
           round(degrees(l_discount), 4) AS deg,
           round(radians(l_extendedprice / 1000.0), 4) AS rad,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
)
def fn_trig_suite(spark, sf_dir):
    """Trigonometric / angular scalar suite, 4-dp pinned (libm last-ulp
    armor, §7.3-H2).  DuckDB ``sign`` yields an integer type — cast to
    DOUBLE in the oracle to match Spark's ``signum``."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 200).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 4).alias("s"),
        F.round(F.cos("l_discount"), 4).alias("c"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01), 4).alias("a2"),
        F.round(F.degrees("l_discount"), 4).alias("deg"),
        F.round(F.radians(F.col("l_extendedprice") / 1000.0), 4).alias("rad"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
    )


@query(
    "embedding_centroid_by_label",
    "LLM-pipeline",
    oracle="""
    SELECT label, pos, round(avg(v), 4) + 0.0 AS avg_v
    FROM (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS pos,
               unnest(embedding) AS v
        FROM embeddings
    )
    GROUP BY 1, 2
    """,
)
def embedding_centroid_by_label(spark, sf_dir):
    """Per-label centroid vectors (the k-means / IVF-training step
    behind ivf_knn_bucketed), computed as a posexplode → (label, pos)
    aggregate so the work is one shuffle on a perfectly balanced
    composite key instead of a driver-side vector sum.  At 100 TB this
    is the scalable element-wise mean: 10 labels × 64 positions = 640
    cells regardless of row count, and the map-side partial aggregate
    collapses each partition to ≤640 rows before the exchange.  DuckDB
    oracle zips two equal-length ``unnest``s for ordinality (no
    WITH ORDINALITY in 1.0); Spark's 0-based posexplode is shifted to
    the 1-based oracle numbering.  ``+ 0.0`` after the round collapses
    IEEE negative zero (DuckDB's round keeps -0.0, Spark's does not —
    found as a real sf0.001 hash mismatch)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg((F.round(F.avg("v"), 4) + 0.0).alias("avg_v"))
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
    "relational_division_all_years",
    "join/subquery",
    oracle="""
    WITH yrs AS (SELECT count(DISTINCT year(o_orderdate)) AS n_years
                 FROM orders)
    SELECT o.o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    GROUP BY o.o_custkey
    HAVING count(DISTINCT year(o_orderdate)) = (SELECT n_years FROM yrs)
    """,
)
def relational_division_all_years(spark, sf_dir):
    """Relational division ("for all"): customers with orders in EVERY
    year the table covers — the universal-quantification shape that SQL
    has no direct operator for, composed as per-group distinct count ==
    broadcast global distinct count.  One shuffle on custkey; the
    1-row divisor crosses in as a broadcast, never a driver-side
    collect."""
    o = table(spark, sf_dir, "orders")
    yrs = o.select(F.year("o_orderdate").alias("y")).agg(
        F.countDistinct("y").alias("n_years")
    )
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct(F.year("o_orderdate")).alias("cust_years"),
    )
    return (
        per_cust.crossJoin(F.broadcast(yrs))
        .filter(F.col("cust_years") == F.col("n_years"))
        .select("custkey", "n_orders")
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
