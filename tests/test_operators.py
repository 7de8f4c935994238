"""Operator-library tests (operators/): properties the oracle can't
express — LSH recall on exact-set duplicates, SimHash invariants,
IVF containment, counters, multimodal stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datastore_mapper_spark.catalog import table
from datastore_mapper_spark.operators import counters, dedup as dd, similarity as sim
from datastore_mapper_spark.operators.multimodal import (
    as_binary_media,
    decode_image_meta,
    extract_media_meta,
)


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def _exact_set_pairs(spark, sf_dir) -> set[tuple[int, int]]:
    """Pairs of docs with identical distinct-token sets (jaccard == 1)."""
    d = _docs(spark, sf_dir)
    keyed = d.select(
        "doc_id",
        F.concat_ws("\x00", F.array_sort(F.array_distinct(F.split("text", " "))))
        .alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    rows = (
        a.join(b, (F.col("a.k") == F.col("b.k"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .collect()
    )
    return {(r.d1, r.d2) for r in rows}


def test_minhash_lsh_finds_exact_set_duplicates(spark, sf_dir):
    """Identical token sets => identical signatures => every band
    collides => the pair MUST be an LSH candidate (no probability)."""
    d = _docs(spark, sf_dir)
    expected = _exact_set_pairs(spark, sf_dir)
    sigs = dd.minhash_signatures(d)
    cands = {
        (r.d1, r.d2) for r in dd.lsh_candidate_pairs(sigs).collect()
    }
    assert expected <= cands


def test_minhash_verify_matches_bruteforce_at_threshold(spark, sf_dir):
    """Every exact-set duplicate pair survives the Jaccard>=0.8 verify
    with jaccard exactly 1.0."""
    d = _docs(spark, sf_dir)
    expected = _exact_set_pairs(spark, sf_dir)
    sigs = dd.minhash_signatures(d)
    verified = dd.verify_jaccard(dd.lsh_candidate_pairs(sigs), d, threshold=0.8)
    ones = {(r.d1, r.d2) for r in verified.filter(F.col("jaccard") == 1.0).collect()}
    assert expected <= ones


def test_simhash_identical_sets_have_zero_hamming(spark, sf_dir):
    d = _docs(spark, sf_dir)
    expected = _exact_set_pairs(spark, sf_dir)
    pairs = dd.simhash_near_pairs(dd.simhash(d), max_hamming=0)
    zero = {(r.d1, r.d2) for r in pairs.collect()}
    assert expected <= zero


def test_exact_dedup_removes_injected_duplicates(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = d.unionAll(d)
    assert dd.exact_dedup(doubled, ["doc_id", "text"]).count() == d.count()


def test_ivf_results_contained_in_bruteforce_bucket(spark, sf_dir):
    """IVF top-k ⊆ brute-force ranking restricted to the query's cell,
    and both rank identically there."""
    e = table(spark, sf_dir, "embeddings")
    bucketed = e.withColumn("bucket", sim.sign_bucket(F.col("embedding")))
    qb = bucketed.filter(F.col("vec_id") == 0).collect()[0].bucket
    cell = bucketed.filter(F.col("bucket") == qb).drop("bucket")
    brute_in_cell = [r.vec_id for r in sim.cosine_topk(cell, 0, k=10).collect()]
    ivf = [r.vec_id for r in sim.ivf_topk(e, 0, k=10).collect()]
    assert ivf == brute_in_cell


def test_observed_counters(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    df, obs = counters.observed_counters(
        o, rows=F.count(F.lit(1)), total=F.round(F.sum("o_totalprice"), 2)
    )
    n = df.count()  # any action materializes the metrics
    assert obs.get["rows"] == n


def test_multimodal_stub_and_fake_path(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\x89PNG")
    media = as_binary_media(_docs(spark, sf_dir))
    meta = extract_media_meta(media, fake=True).collect()
    assert all(0 <= r.width < 640 and 0 <= r.height < 480 for r in meta)
    by_id = {r.doc_id: r for r in meta}
    src = _docs(spark, sf_dir).select("doc_id", "text").collect()
    for r in src[:20]:
        assert by_id[r.doc_id].n_bytes == len(r.text.encode("utf-8"))


def test_connected_components_known_graph(spark):
    from datastore_mapper_spark.operators.dedup import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 20)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        ["d1", "d2"],
    )
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_multimodal_resize_exact_sizes(spark, sf_dir):
    from datastore_mapper_spark.operators.multimodal import (
        as_binary_media,
        resize_media,
    )

    d = table(spark, sf_dir, "documents").limit(50)
    media = as_binary_media(d)
    out = resize_media(media, 16, 8)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.payload) == 16 * 8 for r in rows)
    assert all((r.width, r.height) == (16, 8) for r in rows)


def test_multimodal_frame_sampling_counts_and_content(spark, sf_dir):
    from datastore_mapper_spark.operators.multimodal import (
        as_binary_media,
        sample_frames,
    )

    d = table(spark, sf_dir, "documents").limit(20)
    media = as_binary_media(d)
    frames = sample_frames(media, every_n=2, frame_bytes=32)
    got = frames.groupBy("doc_id").count().collect()
    expected = {
        r.doc_id: (((len(r.payload) + 31) // 32) + 1) // 2
        for r in media.collect()
    }
    assert {r.doc_id: r["count"] for r in got} == expected
    one = frames.filter(F.col("frame_no") == 0).first()
    src = dict((r.doc_id, r.payload) for r in media.collect())[one.doc_id]
    assert bytes(one.frame) == bytes(src[:32])


def test_multimodal_features_feed_similarity_ops(spark, sf_dir):
    import math

    from datastore_mapper_spark.operators.multimodal import (
        as_binary_media,
        extract_features,
    )

    d = table(spark, sf_dir, "documents").limit(30)
    feats = extract_features(as_binary_media(d), dim=16)
    rows = feats.collect()
    assert all(len(r.feature) == 16 for r in rows)
    assert all(math.isclose(sum(r.feature), 1.0, rel_tol=1e-5) for r in rows)
    # the schema matches the embeddings table's array<float> contract
    assert dict(feats.dtypes)["feature"] == "array<float>"
