"""Distributed PCA over the embedding corpus (SURVEY.md E3 extension).

The scale-honest construction: PCA at 100 TB is one pass of mergeable
MOMENT accumulation (per-partition sums and second-moment matrices,
added in any order) plus a driver-side eigendecomposition of the tiny
dim x dim result — never a distributed eigensolver, never a collect of
the corpus. The same shape every production system uses (Spark MLlib's
RowMatrix.computePrincipalComponents, scikit-learn's incremental PCA).

Determinism trick (this module's contribution): embeddings quantize to
fixed-point int64 by floor(x * 2^20) — scaling by a POWER OF TWO is
exact in binary floating point, so quantization has zero rounding
surface — and all moments accumulate as exact integers. Integer sums
are associative/commutative, so the covariance matrix is bit-identical
under any partitioning, any partial-aggregation order, and any engine
(the DuckDB oracle mirrors it exactly). The float eigendecomposition
then runs on IDENTICAL input everywhere, making even the rows-only
projection reproducible.

Overflow budget: |q_i| <= S * max|x|; per-pair products bound by
S^2 * max|x|^2 = 2^40 at unit-scale embeddings; int64 holds corpus sums
up to ~2^63 / 2^40 = 8.4e6 rows per partition-batch and decimal(38,0)
holds the global sum for any corpus; the driver asserts the final cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale, a power of two so x * SCALE is EXACT in float64
QUANT_BITS = 20
QUANT_SCALE = 1 << QUANT_BITS


def second_moments(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact int64 second-moment matrix of floor(x * 2^20) quantized
    embeddings: rows (i, j, s) for 1 <= i <= j <= dim (1-based, upper
    triangle) with s = sum_rows q_i * q_j.

    One mapInPandas pass emits ONE dim x dim partial matrix per Arrow
    batch (a numpy int64 matmul — the per-batch row count keeps the
    int64 accumulation within bounds, see module docstring); the final
    groupBy(i, j) merges dim^2/2-row partials, decimal(38,0) so the
    global sum cannot overflow at any corpus size. Map-side work is
    O(rows * dim^2) flops; shuffle is O(partitions * dim^2) rows —
    independent of corpus size."""
    tri = np.triu_indices(dim)

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(mat * QUANT_SCALE).astype(np.int64)
            m = q.T @ q
            yield pd.DataFrame(
                {
                    "i": tri[0] + 1,
                    "j": tri[1] + 1,
                    "s_part": m[tri],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, s_part long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(F.sum(F.col("s_part").cast("decimal(38,0)")).alias("s_dec"))
        .select("i", "j", F.col("s_dec").cast("long").alias("s"))
    )


def _moments_driver(
    df: DataFrame, dim: int, vec_col: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """Collect exact integer (sum vector, second-moment matrix, count).
    Driver traffic is dim + dim^2/2 numbers, independent of corpus
    size."""

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(mat * QUANT_SCALE).astype(np.int64)
            m = q.T @ q
            tri = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "kind": ["m"] * len(tri[0]) + ["v"] * dim + ["n"],
                    "i": np.concatenate([tri[0] + 1, np.arange(1, dim + 1), [0]]),
                    "j": np.concatenate([tri[1] + 1, np.zeros(dim, np.int64), [0]]),
                    "s_part": np.concatenate(
                        [m[tri], q.sum(axis=0), [len(q)]]
                    ),
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="kind string, i int, j int, s_part long")
        .groupBy("kind", "i", "j")
        .agg(F.sum(F.col("s_part").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    moments = np.zeros((dim, dim), dtype=np.float64)
    sums = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        if r.kind == "n":
            n = int(r.s)
        elif r.kind == "v":
            sums[r.i - 1] = float(r.s)
        else:
            moments[r.i - 1, r.j - 1] = float(r.s)
            moments[r.j - 1, r.i - 1] = float(r.s)
    return sums, moments, n


def pca_components(
    df: DataFrame,
    dim: int,
    n_components: int = 2,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Top principal components of the (centered) quantized embeddings:
    cov = (M - sums sumsᵀ / n) / (n - 1) from the EXACT integer
    moments, then one numpy eigh of the dim x dim matrix on the driver.
    Sign convention: each component's largest-|entry| coordinate is
    positive (eigh's sign is otherwise arbitrary). Returns
    (n_components, dim) float64, in original (unquantized) units'
    direction space — eigenvectors are scale-invariant."""
    comps, _, _ = _pca_fit(df, dim, n_components, vec_col)
    return comps


def _pca_fit(
    df: DataFrame, dim: int, n_components: int, vec_col: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """One moment pass -> (components, quantized mean, n)."""
    sums, moments, n = _moments_driver(df, dim, vec_col)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    cov = (moments - np.outer(sums, sums) / n) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:n_components]].T
    for c in comps:
        k = int(np.argmax(np.abs(c)))
        if c[k] < 0:
            c *= -1.0
    return comps, sums / n, n


def pca_project(
    df: DataFrame,
    dim: int,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_scale: int = 1000,
) -> DataFrame:
    """Project every vector onto the top principal components; emits
    integer milli-unit coordinates (floor(p * out_scale)) so the output
    is hashable/stable. Projection is map-side: the (n_components, dim)
    matrix broadcasts; the corpus streams one Arrow-batched matmul.
    Components come from the exact-integer moment pass, so the SAME
    matrix reaches every executor regardless of partitioning."""
    comps, mean_q, _ = _pca_fit(df, dim, n_components, vec_col)
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((comps, mean_q))

    def project(batches):
        comps_b, mean_b = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(mat * QUANT_SCALE)
            centered = (q - mean_b) / QUANT_SCALE
            proj = centered @ comps_b.T
            out = {"id": pdf[id_col].to_numpy()}
            for c in range(comps_b.shape[0]):
                out[f"pc{c + 1}_milli"] = np.floor(
                    proj[:, c] * out_scale
                ).astype(np.int64)
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(
        f"pc{c + 1}_milli long" for c in range(n_components)
    )
    return df.select(id_col, vec_col).mapInPandas(project, schema=schema)


def pca_project_frozen(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_scale: int = 1000,
) -> DataFrame:
    """Projection onto the FROZEN pretrained components
    (operators/frozen_pca.py — the live exact-moment fit run once and
    quantized to the 2^COMP_BITS grid): the production serve shape,
    where the projection matrix is fit on a bounded sample ONCE and
    every later corpus pass is pure map-side matmul. Unlike
    :func:`pca_project` (float64 BLAS matmul, rows-only), every step
    here is int64-exact —

        out_c = floor( ((q*N - SUMS_Q) . COMPS_Q[c]) * out_scale
                       / (N * 2^20 * 2^COMP_BITS) )

    with |q| <= 2^20, N = 500, comps at 2^14: the dot is <= ~2^50 and
    the scaled numerator <= ~2^60, so int64 carries it everywhere and
    the DuckDB oracle replays the pipeline bit-identically."""
    from .frozen_pca import COMP_BITS, COMPS_Q, N, SUMS_Q

    comps = np.asarray(COMPS_Q, dtype=np.int64)
    sums = np.asarray(SUMS_Q, dtype=np.int64)
    denom = N * QUANT_SCALE * (1 << COMP_BITS)

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(mat * QUANT_SCALE).astype(np.int64)
            if q.size and int(np.abs(q).max()) >= 1 << 21:
                raise ValueError(
                    "pca_project_frozen: |q| >= 2^21 breaks the int64 "
                    "exactness budget (unit-scale embeddings expected)"
                )
            a = (q * N - sums) @ comps.T  # int64 exact
            out = {"id": pdf[id_col].to_numpy()}
            for c in range(comps.shape[0]):
                out[f"pc{c + 1}_milli"] = np.floor_divide(
                    a[:, c] * out_scale, denom
                )
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(
        f"pc{c + 1}_milli long" for c in range(comps.shape[0])
    )
    return df.select(id_col, vec_col).mapInPandas(project, schema=schema)
