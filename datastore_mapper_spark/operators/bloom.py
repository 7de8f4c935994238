"""Bloom-filter runtime join prefilter — the 'runtime filter' every
warehouse engine applies to big probe-side scans (Spark's own
InjectRuntimeFilter does exactly this internally; here it is an
explicit, testable operator since the SQL surface functions
``bloom_filter_agg``/``might_contain`` are not exposed in this build).

Shape: the BUILD side (small, e.g. filtered dim keys) folds into a
sparse bitmap — (word_index -> 64-bit word) map — via one JVM-side
aggregation; the PROBE side evaluates k xxhash64 positions per row
against the broadcast map entirely in whole-stage codegen (higher-order
``aggregate`` over the position array, no Python, no shuffle).  Rows
failing ANY position are provably non-matches and never reach the join
shuffle; surviving rows still go through the EXACT join, so false
positives cost only wasted shuffle, never wrong answers.

At 100 TB this is the difference between shuffling the whole fact
table into a semi join and shuffling ~(matches + fp_rate x
non-matches): with m/n = 10 bits per key and k = 7 the classic bound
gives ~1 % false positives.  The bitmap itself is O(m) bits on the
driver/broadcast — dimension-key-tier, independent of fact size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(
    df: DataFrame,
    key: str,
    num_bits: int,
    num_hashes: int = 7,
) -> DataFrame:
    """Fold ``df[key]`` into a 1-row sparse Bloom bitmap:
    ``map<bigint, bigint>`` of word-index -> OR-ed 64-bit word.

    Each key sets ``num_hashes`` positions ``pmod(xxhash64(i, key),
    num_bits)``; the per-word OR is a two-level aggregation (word
    groupBy, then map_from_entries over the |set words| rows — at
    m = 10 n bits that is <= n entries, dimension-tier)."""
    # seeds are BIGINT literals on BOTH sides: xxhash64 hashes the
    # seed's type, so an int seed here and a {i}L seed in the probe
    # expression would hash differently (silent false negatives)
    positions = df.select(
        F.explode(
            F.array(*[
                F.expr(f"pmod(xxhash64({i}L, {key}), {num_bits}L)")
                for i in range(num_hashes)
            ])
        ).alias("pos")
    )
    words = positions.groupBy(
        (F.col("pos") / 64).cast("bigint").alias("w")
    ).agg(
        # pyspark's F.shiftleft only takes a literal shift; the SQL
        # form accepts a column
        F.bit_or(F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))"))
        .alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits")))
        .alias("bloom")
    )


def might_contain(
    bloom_name: str, key_name: str, num_bits: int, num_hashes: int = 7
) -> Column:
    """Codegen-side membership test against a :func:`bloom_build` map
    column named ``bloom_name``, keyed on column ``key_name``: TRUE
    unless some hash position's bit is absent (missing word = all-zero
    word).  Pure SQL expression — whole-stage codegen, no Python, no
    per-row map materialization."""
    parts = []
    for i in range(num_hashes):
        pos = f"pmod(xxhash64({i}L, {key_name}), {num_bits}L)"
        word = (f"coalesce(element_at({bloom_name}, "
                f"cast({pos} div 64 as bigint)), 0L)")
        bit = f"shiftleft(1L, cast(pmod({pos}, 64) as int))"
        parts.append(f"(({word} & {bit}) != 0)")
    return F.expr(" AND ".join(parts))


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    bits_per_key: int = 10,
    num_hashes: int = 7,
) -> tuple[DataFrame, int]:
    """Exact semi join with a Bloom prefilter on the probe side.

    Returns ``(filtered_exact_semi_join, num_bits)``: the probe rows
    that pass the broadcast bitmap AND the exact key join — identical
    rows to a plain left-semi join (false positives are removed by the
    exact join; false negatives are impossible), with the fact-side
    shuffle bounded by matches + fp x non-matches."""
    n = build.select(build_key).distinct().count()
    num_bits = max(64, n * bits_per_key)
    bloom = bloom_build(build.select(build_key).distinct(), build_key,
                        num_bits, num_hashes)
    pref = probe.crossJoin(F.broadcast(bloom)).filter(
        might_contain("bloom", probe_key, num_bits, num_hashes)
    ).drop("bloom")
    return (
        pref.join(build.select(build_key).distinct(),
                  pref[probe_key] == build[build_key], "left_semi"),
        num_bits,
    )
