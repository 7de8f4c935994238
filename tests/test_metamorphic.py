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
