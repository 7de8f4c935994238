"""Extension function-suite queries (beyond SURVEY §2.B #35-42):
bitwise/hash/regexp/JSON/map/array/date/string/trig/encode coverage,
each an oracle-checked JVM-expression pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_bitwise_suite",
    "scalar fn",
    oracle="""
    SELECT event_id,
           user_id & 255 AS band,
           user_id | 1024 AS ored,
           xor(user_id, event_id) AS xored,
           user_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS INT) AS popcnt
    FROM events
    """,
)
def fn_bitwise_suite(spark, sf_dir):
    """Bitwise AND/OR/XOR/shifts/popcount on 64-bit keys."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("user_id & 255").alias("band"),
        F.expr("user_id | 1024").alias("ored"),
        F.expr("user_id ^ event_id").alias("xored"),
        F.expr("user_id << 2").alias("shl"),
        F.expr("event_id >> 3").alias("shr"),
        F.bit_count("event_id").alias("popcnt"),
    )


@query(
    "fn_hash_suite",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def fn_hash_suite(spark, sf_dir):
    """Cryptographic digests — standard algorithms, so they cross-check
    between engines (unlike engine hash functions such as xxhash64).
    At scale: dedup shuffles move the 16/32-byte digest, not the text."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.md5(blob).alias("md5_hex"),
        F.sha2(blob, 256).alias("sha256_hex"),
    )


@query(
    "fn_regexp_suite",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words
    FROM part
    WHERE regexp_matches(p_name, 'widget|gear')
    """,
)
def fn_regexp_suite(spark, sf_dir):
    """regexp_replace / rlike filter / extract_all counting (POSIX-simple
    patterns only — §7.3-H6 flavor caution)."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("widget|gear")).select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("n_words"),
    )


@query(
    "fn_higher_order_array",
    "array fn",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum'), 4) AS sum_sq
    FROM embeddings
    WHERE vec_id < 500
    """,
)
def fn_higher_order_array(spark, sf_dir):
    """Lambda higher-order functions over array<float>: filter /
    transform / aggregate (fold).  Elements cast to DOUBLE *inside* the
    lambda on both sides so the multiply happens at the same precision
    (float*float would round differently)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.expr(
            "round(aggregate(embedding, cast(0.0 as double), "
            "(acc, x) -> acc + cast(x as double) * cast(x as double)), 4)"
        ).alias("sum_sq"),
    )


@query(
    "fn_try_safe",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
                         ELSE CAST(o_orderkey AS VARCHAR) END
                    AS BIGINT) AS tc,
           round(o_totalprice / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0.0),
                 4) AS td
    FROM orders
    WHERE o_orderkey < 20000
    """,
)
def fn_try_safe(spark, sf_dir):
    """Error-safe functions: ``try_cast`` (NULL on bad parse) and
    ``try_divide`` (NULL on /0 — the oracle spells it NULLIF, the
    semantics try_divide is defined by)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority "
            "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
        ).alias("tc"),
        F.round(
            F.try_divide(F.col("o_totalprice"),
                         (F.col("o_orderkey") % 5).cast("double")),
            4,
        ).alias("td"),
    )


@query(
    "fn_date_extra",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           last_day(o_orderdate) AS ld,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS am,
           round((1998 - year(o_orderdate)) * 12
                 + (1 - month(o_orderdate))
                 + (1 - day(o_orderdate)) / 31.0, 4) AS mb
    FROM orders
    WHERE o_orderkey < 10000
    """,
)
def fn_date_extra(spark, sf_dir):
    """Extended date functions: last_day, add_months, months_between
    (oracle inlines Spark's documented 31-day-fraction formula)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 10000)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("ld"),
        F.add_months("o_orderdate", 2).alias("am"),
        F.round(F.months_between(F.lit("1998-01-01").cast("date"),
                                 F.col("o_orderdate")), 4).alias("mb"),
    )


@query(
    "fn_posexplode_ordinal",
    "array/table fn",
    oracle="""
    SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, toks[g.i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 100),
         LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    """,
)
def fn_posexplode_ordinal(spark, sf_dir):
    """Positional explode (token + 0-based ordinal) — the ordered form
    of #40's explode; the position column is what n-gram/shingle
    construction windows over."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@query(
    "fn_from_json_struct",
    "json fn",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_from_json_struct(spark, sf_dir):
    """Schema-full JSON parsing (``from_json`` to a typed struct, field
    access) vs #41's schemaless ``get_json_object`` path."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@query(
    "fn_regexp_extract_all",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'w[a-z]+')) AS INT) AS n_w,
           coalesce(array_to_string(
               regexp_extract_all(text, 'w[a-z]+')[1:3], ','), '') AS first3
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_regexp_extract_all(spark, sf_dir):
    """All-matches regex extraction into an array + slice/join —
    POSIX-simple pattern so RE2/Java flavors agree (§7.3-H6)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    matches = F.regexp_extract_all("text", F.lit("w[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(matches).alias("n_w"),
        F.array_join(F.slice(matches, 1, 3), ",").alias("first3"),
    )


@query(
    "fn_format_string",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           printf('%s|%07d|%.2f', o_orderstatus, o_orderkey, o_totalprice)
               AS s
    FROM orders
    WHERE o_orderkey < 10000
    """,
)
def fn_format_string(spark, sf_dir):
    """printf-style formatting (zero-pad, fixed decimals) — the record
    serialization used by text sinks; ``format_string`` ≙ ``printf``."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 10000)
    return o.select(
        "o_orderkey",
        F.format_string(
            "%s|%07d|%.2f", "o_orderstatus", "o_orderkey", "o_totalprice"
        ).alias("s"),
    )


@query(
    "fn_map_type",
    "map fn",
    oracle="""
    SELECT n_name,
           map(['key', 'region'],
               [CAST(n_nationkey AS VARCHAR), CAST(n_regionkey AS VARCHAR)]
           )['region'][1] AS r,
           2 AS n_keys
    FROM nation
    """,
)
def fn_map_type(spark, sf_dir):
    """MapType construction + key access (the Datastore property-bag
    shape, §1.1).  DuckDB map access returns a 1-element list — oracle
    indexes ``[1]``; ``size(map)`` ≙ literal key count here."""
    n = table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("region")),
        F.array(
            F.col("n_nationkey").cast("string"),
            F.col("n_regionkey").cast("string"),
        ),
    )
    return n.select(
        "n_name",
        m.getItem("region").alias("r"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_date_sequence",
    "array/table fn",
    oracle="""
    SELECT o_orderkey,
           CAST(unnest(generate_series(
               CAST(o_orderdate AS DATE),
               CAST(o_orderdate AS DATE) + 3,
               INTERVAL 1 DAY)) AS DATE) AS d
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def fn_date_sequence(spark, sf_dir):
    """Row → date-range expansion (``sequence`` + explode ≙
    ``generate_series``): the calendar-densification primitive behind
    gap-filling and per-day rollups of ranged records."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d0 = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(d0, F.date_add(d0, 3))).alias("d"),
    )


@query(
    "fn_to_json",
    "json fn",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name, region := n_regionkey)) AS j
    FROM nation
    """,
)
def fn_to_json(spark, sf_dir):
    """Struct → JSON serialization (the write-side twin of #41/#91
    extraction); byte-identical rendering across engines for
    string/int fields."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("name"),
                     F.col("n_regionkey").alias("region"))
        ).alias("j"),
    )


@query(
    "fn_array_set_algebra",
    "array fn",
    oracle="""
    SELECT vec_id,
           CAST(len(list_distinct(list_intersect(a, b))) AS INT) AS n_int,
           CAST(len(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))) AS INT) AS n_exc
    FROM (SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(round(x * 10) AS INTEGER))[1:20] AS a,
                 list_transform(embedding,
                                x -> CAST(round(x * 7) AS INTEGER))[1:20] AS b
          FROM embeddings WHERE vec_id < 500)
    """,
)
def fn_array_set_algebra(spark, sf_dir):
    """Per-row array set algebra (intersect/except) over derived int
    arrays — Spark's variants return DISTINCT elements, mirrored with
    list_distinct in the oracle."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    a = F.slice(F.expr("transform(embedding, x -> CAST(round(x*10) AS INT))"), 1, 20)
    b = F.slice(F.expr("transform(embedding, x -> CAST(round(x*7) AS INT))"), 1, 20)
    return e.select(
        "vec_id",
        F.size(F.array_intersect(a, b)).alias("n_int"),
        F.size(F.array_except(a, b)).alias("n_exc"),
    )


@query(
    "fn_split_part",
    "scalar fn",
    oracle="""
    SELECT doc_id, split_part(text, ' ', 1) AS w1,
           split_part(text, ' ', 3) AS w3
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_split_part(spark, sf_dir):
    """Field extraction by delimiter index (1-based, same name and
    semantics in both engines)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return d.select(
        "doc_id",
        F.split_part("text", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("text", F.lit(" "), F.lit(3)).alias("w3"),
    )


@query(
    "fn_levenshtein",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           levenshtein(split_part(text, ' ', 1),
                       split_part(text, ' ', 2)) AS d12,
           levenshtein(split_part(text, ' ', 1),
                       split_part(text, ' ', 4)) AS d14
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_levenshtein(spark, sf_dir):
    """Edit distance between token pairs — the fuzzy-match primitive
    under typo-tolerant dedup; same name and semantics both engines."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    w = lambda i: F.split_part("text", F.lit(" "), F.lit(i))  # noqa: E731
    return d.select(
        "doc_id",
        F.levenshtein(w(1), w(2)).alias("d12"),
        F.levenshtein(w(1), w(4)).alias("d14"),
    )


@query(
    "fn_trunc_week_quarter",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qt,
           CAST(quarter(o_orderdate) AS INT) AS qn,
           CAST(weekofyear(o_orderdate) AS INT) AS wn
    FROM orders
    WHERE o_orderkey < 20000
    """,
)
def fn_trunc_week_quarter(spark, sf_dir):
    """Week/quarter truncation + ISO week numbering (both engines use
    Monday-start ISO weeks; Spark date_trunc yields TIMESTAMP — cast
    to DATE to align types)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qt"),
        F.quarter("o_orderdate").alias("qn"),
        F.weekofyear("o_orderdate").alias("wn"),
    )


@query(
    "fn_string_extra",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_type, 10, '.') AS rp,
           reverse(p_name) AS rev,
           translate(p_name, 'aeiou', '_____') AS tr,
           repeat(left(p_brand, 2), 3) AS rep,
           CAST(instr(p_name, 'e') AS INT) AS pos_e
    FROM part
    WHERE p_partkey < 2000
    """,
)
def fn_string_extra(spark, sf_dir):
    """Second string-function sweep: pad/reverse/translate/repeat/
    instr (1-based find, 0 = absent) — identical names and semantics
    in both engines (DuckDB 1.0 lacks only initcap, which is omitted)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 2000)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_type", 10, ".").alias("rp"),
        F.reverse("p_name").alias("rev"),
        F.translate("p_name", "aeiou", "_____").alias("tr"),
        F.repeat(F.substring("p_brand", 1, 2), 3).alias("rep"),
        F.instr("p_name", "e").alias("pos_e"),
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
    "fn_array_extra",
    "function suite",
    oracle="""
    SELECT doc_id,
           COALESCE(list_position(string_split(text, ' '), 'the'), 0)
               AS pos_the,
           len(list_filter(string_split(text, ' '),
                           x -> length(x) > 4)) AS n_long,
           list_sort(list_distinct(string_split(text, ' ')))[1]
               AS first_tok,
           string_split(text, ' ')[2:4] AS mid_slice
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_array_extra(spark, sf_dir):
    """Second array-function batch: array_position (Spark's 0-on-miss ≙
    DuckDB COALESCE(list_position, 0)), filtered length, sorted-distinct
    head, and slice — rounding out the §2.B array suite with the
    navigation/slicing primitives list-heavy ETL uses."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_position(toks, "the").cast("bigint").alias("pos_the"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("bigint")
        .alias("n_long"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1)
        .alias("first_tok"),
        F.slice(toks, 2, 3).alias("mid_slice"),
    )


@query(
    "fn_variant_json",
    "json fn",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN json_extract_string(props, '$.missing')
                           IS NULL THEN 1 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant_json(spark, sf_dir):
    """Spark 4 VARIANT path: ``parse_json`` once into the open-schema
    binary VARIANT encoding, then typed ``variant_get`` extraction —
    the semi-structured analogue of the reference's schemaless entity
    properties, and ~an order cheaper than repeated string
    ``get_json_object`` parsing at 100 TB because the parse happens
    once per row, not once per extraction.  ``try_variant_get`` on an
    absent path yields NULL (counted) instead of erroring."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("miss"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("miss").isNull(), 1)).alias("n_missing"),
        )
    )


@query(
    "fn_url_suite",
    "scalar fn",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.org/' || lang || '/'
                 || CAST(doc_id AS VARCHAR) || '?q=' ||
                 CAST(n_chars AS VARCHAR) || '&page=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
    FROM urls
    """,
)
def fn_url_suite(spark, sf_dir):
    """URL parsing suite — ``parse_url`` component extraction
    (PROTOCOL/HOST/PATH/QUERY and a named query parameter) over URLs
    synthesized from fixture columns.  The oracle parses the same URLs
    with independent regexes, so Spark's JVM-side ``parse_url``
    (backed by java.net.URI, a whole-stage-codegen expression — no
    Python in the pipeline) is checked against a from-scratch
    implementation rather than itself.  The per-domain crawl
    accounting every web-corpus pipeline starts with (host extraction
    -> groupBy) rides on exactly this expression."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?q="), F.col("n_chars").cast("string"), F.lit("&page=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


@query(
    "pivot_event_type_daily",
    "relational/pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS TIMESTAMP) AS day,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
)
def pivot_event_type_daily(spark, sf_dir):
    """Relational PIVOT: per-day event counts fanned into one column
    per event type — the wide-format rollup dashboards ask for.  The
    value list is EXPLICIT (``pivot(col, values)``), which matters at
    100 TB: without it Spark first runs a distinct scan over the pivot
    column to discover values (an extra job over the full table).  One
    shuffle on the day key; the pivot itself is a projection.  The
    oracle writes the same shape with FILTERed counts."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(F.date_trunc("day", "ts_us").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "unpivot_lineitem_charges",
    "relational/unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(amount AS DOUBLE) AS amount
    FROM (
        SELECT l_orderkey, l_linenumber, 'price' AS metric,
               l_extendedprice AS amount
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey < 1000
    )
    """,
)
def unpivot_lineitem_charges(spark, sf_dir):
    """Relational UNPIVOT (melt): the three charge columns become
    (metric, amount) rows — long format for generic per-metric
    pipelines.  ``DataFrame.unpivot`` is a zero-shuffle projection
    with a 3x row fan-out (Expand node), NOT three self-unions — at
    100 TB the union form scans the table three times, the unpivot
    scans it once.  The oracle IS the three-way union, proving the
    single-scan rewrite emits the identical multiset."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_extendedprice", "price")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax"),
    )


@query(
    "fn_higher_order_suite",
    "functions/higher-order",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> length(t) > 5)) AS INT)
               AS n_long,
           list_transform(toks[1:3], t -> upper(t)) AS first3_upper,
           CAST(len(list_filter(toks, t -> contains(t, 'e'))) > 0
                AS BOOLEAN) AS any_e,
           CAST(len(list_filter(toks, t -> length(t) > 0)) = len(toks)
                AS BOOLEAN) AS all_nonempty,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
               AS total_chars
    FROM t
    """,
)
def fn_higher_order_suite(spark, sf_dir):
    """Higher-order array lambdas as a dedicated contract row:
    ``filter`` / ``transform`` / ``exists`` / ``forall`` /
    ``aggregate`` (fold) over the token array.  These are Catalyst
    LambdaFunction expressions — fully JVM-side, inside whole-stage
    codegen, NO Python in the loop — which is exactly why they are the
    100 TB substitute for a per-row Python UDF over array columns
    (SURVEY §3.2: the UDF escape hatch is the LAST resort).  The
    oracle replays each lambda with DuckDB's list functions —
    independent implementations of the same fold semantics."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 5))
        .cast("int")
        .alias("n_long"),
        F.transform(F.slice(toks, 1, 3), F.upper).alias("first3_upper"),
        F.exists(toks, lambda t: t.contains("e")).alias("any_e"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.length(t).cast("bigint"),
        ).alias("total_chars"),
    )


@query(
    "fn_map_suite",
    "functions/map",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(2 AS INT) AS map_size,
           CAST(max(n_chars) AS BIGINT) AS via_key_chars,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS via_key_toks
    FROM documents
    GROUP BY lang
    """,
)
def fn_map_suite(spark, sf_dir):
    """MapType surface: build a per-row map from key/value arrays
    (``map_from_arrays``), read it back with ``element_at`` and
    ``map_keys``/``size`` — the schemaless-property-bag access pattern
    of the reference's entities (SURVEY §1.1: Datastore properties ≙
    map fields).  Keyed lookups then aggregate; the oracle computes
    the same maxima from the raw columns, proving map construction +
    extraction is lossless.  Scalars out, not raw maps: map column
    hashing is ordering-sensitive across engines."""
    d = table(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("chars"), F.lit("toks")),
        F.array(
            F.col("n_chars").cast("long"),
            F.size(F.split("text", " ")).cast("long"),
        ),
    )
    mapped = d.select("lang", m.alias("props"))
    return mapped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.max(F.size("props")).cast("int").alias("map_size"),
        F.max(F.element_at("props", "chars")).alias("via_key_chars"),
        F.max(F.element_at("props", "toks")).alias("via_key_toks"),
    )


@query(
    "agg_bitwise_xor_digest",
    "functions/bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor,
           CAST(bit_xor(o_orderkey << 1) AS BIGINT) AS shifted_xor
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bitwise_xor_digest(spark, sf_dir):
    """Bitwise aggregate surface: ``bit_and``/``bit_or``/``bit_xor``
    plus a shift inside the aggregate.  XOR aggregation is the
    order-insensitive content-digest primitive (set reconciliation,
    table diffing at 100 TB: xor of row hashes compares two tables in
    one pass with no sort) — this row pins its exactness cross-engine
    on int64, including associativity under Spark's partial/final
    two-phase aggregation."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.bit_xor(F.shiftleft("o_orderkey", 1).cast("long")).alias("shifted_xor"),
    )
