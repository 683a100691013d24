"""Frequency sketches: count-min + heavy hitters (Cormode & Muthukrishnan
2005, "An improved data stream summary: the count-min sketch and its
applications"). Completes the mergeable-sketch family next to the
built-ins the engine already registers (HLL approx-distinct, GK
percentiles) and the Bloom membership bitmap (operators/membership.py).

The 100 TB shape is the textbook one:

- **Partial sketches are built map-side** — one mapInPandas pass per
  input split emits its own d x w counter matrix as sparse (r, c, n)
  cells; nothing keyed by token ever shuffles (the whole point: exact
  heavy hitters need a groupBy over every distinct token — billions of
  keys — while the sketch exchange is bounded by d*w per split
  regardless of input size).
- **Merging is elementwise sum** — count-min is linear, so one
  partial-aggregable groupBy(r, c) folds any number of splits, days, or
  streams into one sketch. Merge-determinism (independent of input
  partitioning) is pinned in tests/test_sketch.py.
- **Point queries broadcast the merged sketch** — d*w longs, a few KB,
  the same only-the-model-moves pattern as operators/kmeans.py.
- **Candidates come from bounded per-split summaries** — a sketch
  estimates counts but cannot enumerate keys. Each split maintains a
  MERGEABLE Misra-Gries summary (Agarwal et al. 2012, "Mergeable
  summaries": add batch counts, then subtract the (cap+1)-th largest
  value and drop the nonpositive) of fixed size ``mg_cap``, NOT an
  exact counter over every distinct token — worker memory is O(cap),
  independent of split cardinality. Guarantee (pigeonhole over splits
  + the MG error bound of n_split/(cap+1)): the candidate union
  contains every key whose GLOBAL count exceeds
  N/(per_split+1) + N/(mg_cap+1); keys spread thinner than that are
  not heavy hitters at any useful k. The candidate set is bounded by
  per_split x splits, never by corpus cardinality.

Hashing is the same public universal family as MinHash
(functions/hashing.minhash_params over the Mersenne prime 2^61-1, on
56-bit md5 token keys) so the sketch is deterministic across runs,
partitionings, and engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, minhash_params


def _row_hashes(keys: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) bucket indices for 56-bit token keys, universal family."""
    out = np.empty((d, len(keys)), dtype=np.int64)
    ks = keys.astype(np.uint64)
    for r, (a, b) in enumerate(minhash_params(d)):
        # exact (a*k + b) mod p in python ints is slow; p = 2^61-1 and
        # k < 2^56 so do it in object-free numpy via the same Mersenne
        # trick as dedup._mulmod_mersenne61
        from .dedup import _mulmod_mersenne61

        h = (_mulmod_mersenne61(a, ks) + np.uint64(b % MINHASH_P)) % np.uint64(
            MINHASH_P
        )
        out[r] = (h % np.uint64(w)).astype(np.int64)
    return out


def cms_partials(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Sparse (r, c, n) count-min cells, one partial matrix per input
    split, ready to merge with groupBy(r, c).sum(n)."""
    from .dedup import _md5_u56_batch

    def gen(batches):
        for pdf in batches:
            toks = [t for t in pdf[key_col] if t is not None]
            if not toks:
                continue
            keys = _md5_u56_batch([t.encode("utf-8") for t in toks])
            hashes = _row_hashes(keys, d, w)
            rs, cs, ns = [], [], []
            for r in range(d):
                counts = np.bincount(hashes[r], minlength=w)
                nz = np.nonzero(counts)[0]
                rs.append(np.full(nz.size, r, dtype=np.int64))
                cs.append(nz.astype(np.int64))
                ns.append(counts[nz].astype(np.int64))
            yield pd.DataFrame(
                {"r": np.concatenate(rs), "c": np.concatenate(cs),
                 "n": np.concatenate(ns)}
            )

    return df.select(key_col).mapInPandas(gen, schema="r int, c long, n long")


def cms_merged(df: DataFrame, key_col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """The merged sketch: d*w (r, c, n) rows (zero cells absent)."""
    return cms_partials(df, key_col, d=d, w=w).groupBy("r", "c").agg(
        F.sum("n").alias("n")
    )


def _mg_merge_batch(summary: dict, toks: list, cap: int) -> None:
    """Fold one Arrow batch into a mergeable Misra-Gries summary in
    place: add exact batch counts, then if over capacity subtract the
    (cap+1)-th largest value from every counter and drop the
    nonpositive — at most ``cap`` residuals survive, and every key's
    residual undercounts its true local count by at most
    n_seen/(cap+1)."""
    for t, c in pd.Series(toks).value_counts().items():
        summary[t] = summary.get(t, 0) + int(c)
    if len(summary) > cap:
        vals = np.fromiter(summary.values(), dtype=np.int64, count=len(summary))
        thr = np.partition(vals, len(vals) - cap - 1)[len(vals) - cap - 1]
        for t in [t for t, c in summary.items() if c <= thr]:
            del summary[t]
        for t in summary:
            summary[t] -= thr


def _top_tokens(summary: dict, per_split: int) -> list:
    """Deterministic local cut: residual count desc, token asc."""
    top = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))[:per_split]
    return [t for t, _ in top]


def _local_top_candidates(
    df: DataFrame, key_col: str, per_split: int, mg_cap: int | None = None
) -> DataFrame:
    """Union of per-split top-C keys from the bounded MG summary — the
    candidate set for heavy-hitter queries (O(mg_cap) worker memory)."""
    cap = mg_cap or 8 * per_split

    def gen(batches):
        summary: dict = {}
        for pdf in batches:
            _mg_merge_batch(summary, [t for t in pdf[key_col] if t is not None], cap)
        if summary:
            yield pd.DataFrame({"token": _top_tokens(summary, per_split)})

    return df.select(key_col).mapInPandas(gen, schema="token string").distinct()


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    d: int = 4,
    w: int = 1024,
    per_split: int = 64,
    mg_cap: int | None = None,
) -> DataFrame:
    """Top-k keys by count-min estimate: ONE fused map pass per split
    emits both the sparse sketch cells and the bounded-MG local top-C
    (the input scan is the dominant cost at scale — two passes would
    double it), lazily checkpointed so the cell aggregate and the
    candidate distinct don't re-run the scan. The merged sketch
    (collected — d*w longs, the few-KB model) broadcasts into an Arrow
    kernel that scores the candidates; (est desc, token asc) order.
    Estimates never underestimate (CMS one-sided error) and are
    partitioning-invariant (linear-sketch merge); the CANDIDATE tail
    can vary with input splits when low-count keys tie at the local
    cut — any key with global count > N/(per_split+1) + N/(mg_cap+1)
    always survives it (module docstring). Properties pinned in
    tests/test_sketch.py."""
    from .dedup import _md5_u56_batch

    cap = mg_cap or 8 * per_split

    def gen(batches):
        cms = np.zeros((d, w), dtype=np.int64)
        summary: dict = {}
        seen = False
        for pdf in batches:
            toks = [t for t in pdf[key_col] if t is not None]
            if not toks:
                continue
            seen = True
            keys = _md5_u56_batch([t.encode("utf-8") for t in toks])
            hashes = _row_hashes(keys, d, w)
            for r in range(d):
                cms[r] += np.bincount(hashes[r], minlength=w)
            _mg_merge_batch(summary, toks, cap)
        if not seen:
            return
        r_idx, c_idx = np.nonzero(cms)
        yield pd.DataFrame(
            {
                "kind": np.zeros(r_idx.size, dtype=np.int32),
                "r": r_idx.astype(np.int32),
                "c": c_idx.astype(np.int64),
                "n": cms[r_idx, c_idx],
                "token": [None] * r_idx.size,
            }
        )
        top = _top_tokens(summary, per_split)
        yield pd.DataFrame(
            {
                "kind": np.ones(len(top), dtype=np.int32),
                "r": np.zeros(len(top), dtype=np.int32),
                "c": np.zeros(len(top), dtype=np.int64),
                "n": np.zeros(len(top), dtype=np.int64),
                "token": top,
            }
        )

    combined = df.select(key_col).mapInPandas(
        gen, schema="kind int, r int, c long, n long, token string"
    ).localCheckpoint(eager=False)
    merged = (
        combined.filter(F.col("kind") == 0)
        .groupBy("r", "c")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    sketch = np.zeros((d, w), dtype=np.int64)
    for row in merged:
        sketch[row.r, row.c] = row.n
    cands = combined.filter(F.col("kind") == 1).select("token").distinct()
    return estimate_topk(sketch, cands, k=k)


def estimate_topk(sketch: np.ndarray, candidates: DataFrame, k: int = 10) -> DataFrame:
    """Top-k of a candidate set (column ``token``) by point estimate
    against an already-merged sketch matrix — shared by the batch and
    streaming (micro-batch-merged) paths."""
    from .dedup import _md5_u56_batch

    d, w = sketch.shape

    def estimate(batches):
        for pdf in batches:
            toks = list(pdf["token"])
            keys = _md5_u56_batch([t.encode("utf-8") for t in toks])
            hashes = _row_hashes(keys, d, w)
            est = sketch[0, hashes[0]]
            for r in range(1, d):
                est = np.minimum(est, sketch[r, hashes[r]])
            yield pd.DataFrame({"token": toks, "est_count": est})

    scored = candidates.mapInPandas(estimate, schema="token string, est_count long")
    return scored.orderBy(F.desc("est_count"), F.asc("token")).limit(k)


# --------------------------------------------------------------- HLL
# HyperLogLog registers (Flajolet et al. 2007) in the cross-engine
# deterministic form of plans/analytics2.x_hll_union_estimate: 56-bit
# md5_long -> 8-bit bucket + 48-bit rank window. Registers merge with
# MAX — idempotent and associative, so at-least-once streams fold to
# exactly-once sketches the same way bitmap words do under bit_or.
HLL_M = 256


def hll_registers(df: DataFrame, scope_cols: list, key_col: str) -> DataFrame:
    """(scope..., bucket, r): the per-scope HLL register frame — one
    partial-aggregable groupBy, <= 256 rows per scope forever after.
    ``key_col`` is hashed via md5_long (salt "|hll", matching the
    registered batch query so twins compare)."""
    from ..functions.hashing import md5_long

    h = md5_long(F.col(key_col).cast("string"), salt="|hll")
    w = F.shiftright(F.col("h"), 8)  # integer shift: h is 56-bit, > 2^53
    rank = F.when(w > 0, F.lit(49) - F.length(F.bin(w))).otherwise(F.lit(49))
    return (
        df.select(*scope_cols, h.alias("h"))
        .withColumn("bucket", F.pmod("h", F.lit(HLL_M)))
        .withColumn("r", rank)
        .groupBy(*scope_cols, "bucket")
        .agg(F.max("r").alias("r"))
    )


HLL_ALPHA_MICRO = 718326  # alpha_256 ~= 0.7213/(1+1.079/256), fixed-point
HLL_EST_NUM = HLL_ALPHA_MICRO * HLL_M * HLL_M * (1 << 49)
HLL_LC_CUTOVER = 5 * HLL_M // 2  # raw estimate <= 2.5m -> linear counting


def hll_lc_table() -> list:
    """Small-range linear-counting lookup: V empty registers ->
    round(m * ln(m / V)) — precomputed so no ln() runs engine-side
    (both engines consume identical integer literals)."""
    import math

    return [(v, round(HLL_M * math.log(HLL_M / v))) for v in range(1, HLL_M + 1)]


def hll_estimate(regs: DataFrame, scope_cols: list) -> DataFrame:
    """(scope..., bucket, r) registers -> (scope..., n_registers,
    est_hll): the integer-exact HLL estimate with the linear-counting
    small-range correction. All arithmetic DECIMAL(38,0); the only
    float is the final exact int->double conversion."""
    from ..functions.rounding import ratio_round_big

    spark = regs.sparkSession
    contrib = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - r AS INT))")
    per_scope = (
        regs.groupBy(*scope_cols)
        .agg(F.count("*").alias("n_registers"), F.sum(contrib).alias("s_nonzero"))
        .withColumn(
            "s_scaled",
            F.col("s_nonzero")
            + (F.lit(HLL_M) - F.col("n_registers")) * F.lit(1 << 49),
        )
    )
    est_num = F.lit(str(HLL_EST_NUM)).cast("decimal(38,0)")
    lc = spark.createDataFrame(hll_lc_table(), "v int, lc_est int")
    raw = per_scope.select(
        *scope_cols,
        "n_registers",
        (F.lit(HLL_M) - F.col("n_registers")).alias("n_empty"),
        ratio_round_big(
            est_num, F.lit(1000000).cast("decimal(38,0)") * F.col("s_scaled"), 0
        ).alias("raw_est"),
    )
    return raw.join(F.broadcast(lc), F.col("v") == F.col("n_empty"), "left").select(
        *scope_cols,
        "n_registers",
        F.when(
            (F.col("n_empty") > 0) & (F.col("raw_est") <= HLL_LC_CUTOVER),
            F.col("lc_est").cast("double"),
        )
        .otherwise(F.col("raw_est"))
        .alias("est_hll"),
    )
