"""Approximate-membership operators: Bloom-filter build + probe.

The 100 TB contamination/dedup shape when even the *distinct keys* of the
reference side are too big to broadcast as rows: fold them into a fixed
``m``-bit Bloom filter (a few MiB regardless of key count), ship ONE
bitmap to every executor, and probe the corpus map-side. False positives
only (tunable via m/k); zero false negatives — so the filter is a safe
pre-screen whose survivors feed the exact (join-based) check, shrinking
the exact join's input from the whole corpus to the candidate sliver.

Everything is deterministic: positions derive from the 56-bit
cross-engine md5 key via a splitmix64-style finalizer — no RNG, so every
run and both phases agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: splitmix64 finalizer constants (public domain, Steele et al.,
#: "Fast splittable pseudorandom number generators", OOPSLA 2014)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _positions(h: "np.ndarray", j: int, m_bits: int) -> "np.ndarray":
    """j-th deterministic bit position for each 64-bit key (vectorized)."""
    # per-j offset reduced mod 2^64 in Python int: numpy warns on uint64
    # SCALAR overflow (array ops wrap silently)
    x = h + np.uint64(((j + 1) * int(_GOLD)) & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    x = x ^ (x >> np.uint64(31))
    return x % np.uint64(m_bits)


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, n_hash: int = 4
) -> bytes:
    """Build the filter over a BIGINT key column: each partition folds its
    keys into a local ``m_bits`` bitmap (mapInPandas, one output row per
    partition), and the driver ORs the partition bitmaps. Driver traffic
    is ``n_partitions * m_bits/8`` bytes — independent of key count,
    which is the whole point at 100 TB (a tree-reduce of bitmaps would
    cut even that; unnecessary below ~thousands of partitions)."""
    n_words = m_bits // 64

    def gen(batches):
        import pandas as pd

        bm = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            h = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
            for j in range(n_hash):
                idx = _positions(h, j, m_bits)
                np.bitwise_or.at(bm, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))
            seen = True
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    rows = df.select(key_col).mapInPandas(gen, "bitmap binary").collect()
    out = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        out |= np.frombuffer(r.bitmap, dtype=np.uint64)
    return out.tobytes()


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    m_bits: int = 1 << 20,
    n_hash: int = 4,
    flag_col: str = "bloom_member",
) -> DataFrame:
    """Probe: append a boolean membership flag, map-side only. The bitmap
    rides an explicit Spark broadcast (one copy per executor, not per
    task closure)."""
    from pyspark.sql.types import StructType

    bc = df.sparkSession.sparkContext.broadcast(bitmap)
    # fresh StructType: .add on df.schema would MUTATE the DataFrame's
    # memoized schema and corrupt the input plan's column resolution
    schema = StructType(list(df.schema.fields)).add(flag_col, "boolean", False)

    def gen(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in batches:
            h = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
            member = np.ones(len(h), dtype=bool)
            for j in range(n_hash):
                idx = _positions(h, j, m_bits)
                member &= (bm[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1) > 0
            yield pdf.assign(**{flag_col: member})

    return df.mapInPandas(gen, schema=schema)
