"""Bloom-prefiltered joins: shrink the big side's shuffle BEFORE the join
when the small side is too big to broadcast as rows but its key-set bloom
filter (MBs) is not.

The classic 100 TB join problem: fact ⋈ filtered-dimension where the
dimension's surviving keys number in the millions — beyond
autoBroadcastJoinThreshold, so Spark plans a shuffle join and the ENTIRE
fact table crosses the wire, mostly to be dropped by the join. The fix
(what engines call runtime filters / sideways information passing):

1. build a bloom filter over the small side's join keys — ``m`` bits
   packed into ``m/64`` longs, ``k`` xxhash64 probes per key, built
   per-partition in numpy and OR-merged on the driver (bitset bytes move,
   never keys);
2. inject it into the big side as a JVM-side filter expression (array
   literal + bit tests — no Python in the row path), which Catalyst
   places below the exchange: non-matching fact rows die map-side;
3. run the ORIGINAL join after — bloom false positives are eliminated by
   the exact equi-join, so the final result is byte-identical to the
   unfiltered join (which is what makes the operator oracle-pairable).

False-positive rate ~ (1 - e^(-k*n/m))^k; size ``m`` at ~10 bits/key for
~1% FP — 1e8 keys = 125 MB would be too big for a literal, so the sizing
guard caps m and the caller chooses between a coarser filter (higher FP =
more shuffle, still correct) or skipping the prefilter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def keyset_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, k_hashes: int = 5
) -> list[int]:
    """Bloom bitset of the distinct values of ``key_col`` as a list of
    ``m_bits/64`` longs. Per-partition numpy bitsets, OR-merged driver-side
    — the shuffle-free build."""
    import numpy as np
    import pandas as pd

    assert m_bits % 64 == 0 and m_bits <= (1 << 27), "m_bits: 64-aligned, <=128Mbit"
    n_words = m_bits // 64

    src = df.select(F.col(key_col).alias("key")).where(F.col("key").isNotNull())
    probes = [
        F.pmod(F.xxhash64(F.col("key"), F.lit(i)), F.lit(m_bits)).alias(f"p{i}")
        for i in range(k_hashes)
    ]
    pos = src.select(*probes)

    def partition_bitset(batches):
        bits = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            for i in range(k_hashes):
                p = pdf[f"p{i}"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    bits, p // 64, np.uint64(1) << (p % 64).astype(np.uint64)
                )
        yield pd.DataFrame({"w": [bits.tobytes()]})

    merged = np.zeros(n_words, dtype=np.uint64)
    for row in pos.mapInPandas(partition_bitset, "w binary").collect():
        merged |= np.frombuffer(row["w"], dtype=np.uint64)
    return [int(x) for x in merged.astype(np.int64)]


def bloom_might_contain(
    bitset: list[int], key: Column, k_hashes: int = 5
) -> Column:
    """JVM-side membership test of ``key`` against a bitset literal —
    stays inside whole-stage codegen, no Python per row."""
    m_bits = len(bitset) * 64
    arr = F.array(*[F.lit(w) for w in bitset])
    cond = None
    for i in range(k_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        shifted = F.call_function(
            "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
        )
        test = shifted.bitwiseAND(F.lit(1)) == F.lit(1)
        cond = test if cond is None else (cond & test)
    return cond


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """``big.join(small, on, how)`` with the big side bloom-prefiltered on
    the small side's keys. Result is EXACTLY the plain join's (the join
    removes bloom false positives); only the shuffle volume changes."""
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom prefilter only tightens inner/semi joins")
    # xxhash64 is TYPE-SENSITIVE (an int and a bigint of equal value hash
    # differently) while the equi-join would silently coerce — mismatched
    # key types would drop genuine matches. Refuse rather than guess a
    # coercion direction.
    big_t, small_t = dict(big.dtypes)[on], dict(small.dtypes)[on]
    if big_t != small_t:
        raise ValueError(
            f"join key {on!r} types differ (big={big_t}, small={small_t}): "
            "cast both sides to one type before bloom_prefilter_join"
        )
    bitset = keyset_bloom(small, on, m_bits, k_hashes)
    pre = big.where(bloom_might_contain(bitset, F.col(on), k_hashes))
    if how == "left_semi":
        return pre.join(small.select(on).distinct(), on, "left_semi")
    return pre.join(small, on, how)
