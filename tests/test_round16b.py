"""Property tests for the round-16 fourth wave (queries/round16b.py,
operators/similarity.jl_*): GDBSCAN partition/invariant laws against a
pure-Python reference closure, synchronous-LPA determinism and
partition laws, JL projection laws, and a numpy twin for the
interpolated Kneser-Ney perplexity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# --- GDBSCAN ----------------------------------------------------------


def _py_gdbscan(edges, all_nodes, min_deg=2):
    """Reference GDBSCAN over an explicit edge list: returns
    (core->cluster, border->cluster, noise-set) with cluster = min
    core id of the core-core component."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    core = {n for n in adj if len(adj[n]) >= min_deg}
    lab = {n: n for n in core}
    changed = True
    while changed:
        changed = False
        for n in core:
            for m in adj[n]:
                if m in core and lab[m] < lab[n]:
                    lab[n] = lab[m]
                    changed = True
    border = {}
    for n in adj:
        if n in core:
            continue
        cs = [lab[m] for m in adj[n] if m in core]
        if cs:
            border[n] = min(cs)
    noise = set(all_nodes) - core - set(border)
    return lab, border, noise


def test_gdbscan_matches_python_reference(spark, sf_dir):
    from datastore_mapper_spark.queries.round16b import (
        gdbscan_neardup_clusters,
    )
    from datastore_mapper_spark.queries.llm_text import near_dup_edges
    from datastore_mapper_spark.catalog import table

    edges = [(r.d1, r.d2)
             for r in near_dup_edges(spark, sf_dir).collect()]
    all_docs = [r.doc_id
                for r in table(spark, sf_dir, "documents")
                .select("doc_id").collect()]
    lab, border, noise = _py_gdbscan(edges, all_docs)

    rows = gdbscan_neardup_clusters(spark, sf_dir).collect()
    got = {r.cluster_id: (r.n_core, r.n_border, r.size) for r in rows}

    from collections import Counter
    want_core = Counter(lab.values())
    want_border = Counter(border.values())
    for cid in set(want_core) | set(want_border):
        nc = want_core.get(cid, 0)
        nb = want_border.get(cid, 0)
        assert got[cid] == (nc, nb, nc + nb), cid
    if noise:
        assert got[-1] == (0, 0, len(noise))
    # partition law: every document is core, border, or noise exactly once
    assert sum(v[2] for v in got.values()) == len(all_docs)


def test_gdbscan_border_never_bridges(spark, sf_dir):
    """A border doc's cluster must be one of its core neighbors'
    clusters — and border docs never merge two core components (the
    semantic difference from plain connected components)."""
    from datastore_mapper_spark.queries.llm_text import near_dup_edges

    edges = [(r.d1, r.d2)
             for r in near_dup_edges(spark, sf_dir).collect()]
    lab, border, _ = _py_gdbscan(edges, set())
    # distinct core components stay distinct even when a border doc
    # touches both: pick any border doc adjacent to 2+ clusters
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n, cl in border.items():
        touching = {lab[m] for m in adj[n] if m in lab}
        assert cl == min(touching)
        # the clusters this border doc touches remain separate labels
        assert len(touching) >= 1


# --- synchronous LPA --------------------------------------------------


def test_lpa_deterministic_and_partitions_nodes(spark, sf_dir):
    from datastore_mapper_spark.queries.round16b import (
        graph_label_propagation,
    )
    from datastore_mapper_spark.queries.llm_text import near_dup_edges

    a = graph_label_propagation(spark, sf_dir).collect()
    b = graph_label_propagation(spark, sf_dir).collect()
    assert a == b  # sync updates + (count DESC, label ASC) => determinism
    n_nodes = (
        near_dup_edges(spark, sf_dir)
        .select(F.col("d1").alias("n"))
        .union(near_dup_edges(spark, sf_dir).select("d2"))
        .distinct()
        .count()
    )
    # every node holds exactly one label; communities of size >= 2 are
    # reported, the rest are singletons
    reported = sum(r.size for r in a)
    assert reported <= n_nodes
    assert all(r.size >= 2 for r in a)


def test_lpa_python_twin_on_small_graph(spark, sf_dir):
    """4-round synchronous LPA with (count desc, min label) tie-break,
    recomputed in pure Python from the same edge snapshot."""
    from datastore_mapper_spark.queries.round16b import (
        graph_label_propagation,
    )
    from datastore_mapper_spark.queries.llm_text import near_dup_edges
    from collections import Counter, defaultdict

    edges = [(r.d1, r.d2)
             for r in near_dup_edges(spark, sf_dir).collect()]
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for n in adj:
            cnt = Counter(lab[m] for m in adj[n])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        lab = new
    want = Counter(lab.values())
    want = sorted((v, k) for k, v in want.items() if v >= 2)
    got = sorted((r.size, r.community_id)
                 for r in graph_label_propagation(spark, sf_dir).collect())
    assert got == want


# --- JL projection ----------------------------------------------------


def test_jl_project_laws(spark, sf_dir):
    """Projection is linear and deterministic; out_dim respected; the
    Rademacher matrix is +-1 only."""
    from datastore_mapper_spark.operators.similarity import (
        _jl_signs, jl_project,
    )
    from datastore_mapper_spark.catalog import table

    signs = _jl_signs(64, 32)
    assert len(signs) == 32 and all(len(r) == 64 for r in signs)
    assert {v for row in signs for v in row} == {1.0, -1.0}
    # signs are reasonably balanced per output dim (LCG sanity)
    for row in signs:
        assert 16 <= sum(1 for v in row if v > 0) <= 48

    e = table(spark, sf_dir, "embeddings").limit(5)
    out = e.select(
        "vec_id",
        jl_project(F.col("embedding"), 64, 32).alias("jp"),
        F.col("embedding"),
    ).collect()
    for r in out:
        assert len(r.jp) == 32
        for j in (0, 7, 31):
            want = sum(float(v) * signs[j][i]
                       for i, v in enumerate(r.embedding))
            assert math.isclose(r.jp[j], want, rel_tol=0, abs_tol=1e-9)


def test_jl_rerank_quality_flag_true(spark, sf_dir):
    from datastore_mapper_spark.queries.round16b import jl_rerank_verified

    rows = jl_rerank_verified(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.quality_ok for r in rows)


# --- Kneser-Ney -------------------------------------------------------


def test_kneser_ney_numpy_twin(spark, sf_dir):
    """Interpolated KN perplexity recomputed directly from raw
    bigram counts in Python for every language."""
    from datastore_mapper_spark.queries.round16b import (
        kneser_ney_bigram_perplexity,
    )
    from datastore_mapper_spark.catalog import table
    from collections import Counter, defaultdict

    docs = table(spark, sf_dir, "documents") \
        .select("lang", "text").collect()
    per_lang = defaultdict(Counter)
    for r in docs:
        toks = r.text.split(" ")
        for a, b in zip(toks, toks[1:]):
            per_lang[r.lang][(a, b)] += 1
    want = {}
    for lang, c12 in per_lang.items():
        c1 = Counter()
        n1_fw = Counter()
        n1_bw = Counter()
        for (a, b), c in c12.items():
            c1[a] += c
            n1_fw[a] += 1
            n1_bw[b] += 1
        T = len(c12)
        num = 0.0
        den = 0
        for (a, b), c in c12.items():
            p = (c - 0.75) / c1[a] + (0.75 * n1_fw[a] / c1[a]) \
                * (n1_bw[b] / T)
            num += c * math.log(p)
            den += c
        want[lang] = round(math.exp(-num / den), 4)
    got = {r.lang: r.kn_perplexity
           for r in kneser_ney_bigram_perplexity(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for lang in want:
        assert abs(got[lang] - want[lang]) <= 2e-4, lang


# --- unigram-LM tokenizer kernel ------------------------------------


def test_viterbi_tiebreak_prefers_fewer_pieces():
    from datastore_mapper_spark.queries.bpe_queries import _viterbi_segment

    # log p(ab) == log p(a) + log p(b) exactly -> score tie -> the
    # single-piece segmentation must win
    lp = {"a": math.log(0.25), "b": math.log(0.25),
          "ab": math.log(0.25) + math.log(0.25)}
    pieces, score = _viterbi_segment("ab", lp, 4)
    assert pieces == ["ab"]
    assert math.isclose(score, lp["ab"])


def test_viterbi_lexicographic_tiebreak():
    from datastore_mapper_spark.queries.bpe_queries import _viterbi_segment

    # equal score, equal piece count -> lexicographically smaller
    # piece tuple: ("ax", "by") vs ("axb", "y") etc. constructed so
    # two 2-piece splits tie on score
    p = math.log(0.25)
    lp = {"a": p, "bc": p, "ab": p, "c": p}
    pieces, _ = _viterbi_segment("abc", lp, 4)
    assert pieces == ["a", "bc"]  # ("a","bc") < ("ab","c")


def test_viterbi_char_fallback_covers_everything():
    from datastore_mapper_spark.queries.bpe_queries import _viterbi_segment

    lp = {c: math.log(1.0 / 3) for c in "abc"}
    pieces, _ = _viterbi_segment("abcabc", lp, 4)
    assert "".join(pieces) == "abcabc"
    assert pieces == list("abcabc")


def test_unigram_seed_vocab_contains_all_chars(spark, sf_dir):
    from datastore_mapper_spark.queries.bpe_queries import (
        unigram_seed_vocab, unigram_word_frequencies,
    )

    seed = dict(unigram_seed_vocab(spark, sf_dir))
    words = [r.w for r in
             unigram_word_frequencies(spark, sf_dir).collect()]
    alphabet = {ch for w in words for ch in w}
    assert alphabet <= set(seed)
    assert all(c > 0 for c in seed.values())
