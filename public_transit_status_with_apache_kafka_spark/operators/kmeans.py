"""E3/iterative: distributed k-means (Lloyd) over an embedding column.

The reference has no clustering, but an ANN/IVF index at 100 TB needs
real centroids (operators/similarity.ivf_topk deliberately uses
first-k-by-id placeholders); this is the missing fit step, built the
way an iterative algorithm should be on Spark:

- **State that iterates lives on the driver and is broadcast** — the
  k x dim centroid matrix is a few KB; only IT crosses the cluster
  boundary each round. The corpus never moves: assignment is a
  map-side Arrow-batched numpy kernel (one matmul per batch — the
  per-row HOF dot product is ~3x slower, measured in
  similarity.lsh_topk), and the centroid update is one partial-
  aggregable groupBy(cell, dim) avg, so each Lloyd round is exactly
  one shuffle of k x dim x partitions partial sums.
- **No collect() of data** — the only driver-side materialization is
  the k x dim centroid table per round.
- **Deterministic everywhere**: init picks the k corpus vectors with
  the smallest salted md5 of their id (reproducible spread without
  RNG state), and ties in assignment break toward the lower cell id,
  so the fit is stable across runs, partitionings, and engines.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.hashing import md5_long


def _collect_sample(
    corpus: DataFrame, n: int, id_col: str, vec_col: str, salt: str
) -> np.ndarray:
    """n deterministic vectors: smallest salted-hash ids win."""
    rows = (
        corpus.select(
            id_col,
            vec_col,
            md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(n)
        .select(vec_col)
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def _init_centroids(
    corpus: DataFrame, k: int, id_col: str, vec_col: str, salt: str
) -> np.ndarray:
    """k deterministic seed vectors: smallest salted-hash ids win."""
    return _collect_sample(corpus, k, id_col, vec_col, salt)


def _assign_udf(centroids: np.ndarray):
    """Nearest-centroid assignment as an Arrow-batched kernel.

    argmin_c ||x - c||^2 == argmin_c (||c||^2 - 2 x . c): one matmul
    per Arrow batch; numpy argmin already breaks ties toward the lower
    cell index."""
    cent = centroids
    cnorm = (cent * cent).sum(axis=1)

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        x = np.array(emb.tolist(), dtype=np.float64)
        d = cnorm[None, :] - 2.0 * (x @ cent.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def _lloyd_numpy(sample: np.ndarray, centroids: np.ndarray, iters: int) -> np.ndarray:
    """Driver-side Lloyd on a bounded training sample — same rules as
    the distributed rounds (argmin ties toward the lower cell, empty
    cells keep their previous centroid), so the only difference is the
    training set."""
    cent = centroids.copy()
    for _ in range(iters):
        cnorm = (cent * cent).sum(axis=1)
        cells = np.argmin(cnorm[None, :] - 2.0 * (sample @ cent.T), axis=1)
        new = cent.copy()
        for c in range(cent.shape[0]):
            mask = cells == c
            if mask.any():
                new[c] = sample[mask].mean(axis=0)
        cent = new
    return cent


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = ":kmeans:v1",
    train_size: int | None = None,
) -> Tuple[np.ndarray, DataFrame]:
    """Run `iters` Lloyd rounds; return (centroids, assignments).

    assignments is a DataFrame (id_col, cell) computed from the FINAL
    centroids, lazily — callers pay for it only if they use it. An
    empty cluster keeps its previous centroid (standard Lloyd fallback,
    deterministic).

    ``train_size``: when set, centroids train on a bounded
    deterministic sample (the ``train_size`` smallest salted-hash ids —
    the same ordering as the seed, so the seed is the sample's prefix)
    with the Lloyd loop run driver-side in numpy — the FAISS-style
    production shape: at 100 TB nobody Lloyd-iterates the corpus; the
    quantizer trains on a bounded sample and only assignment/encoding
    stream the data. This also collapses ``iters`` Spark jobs into one
    sample collect. Assignment of the FULL corpus is distributed
    either way. None = full-corpus distributed Lloyd (exact means)."""
    vecs = corpus.select(id_col, vec_col)
    if train_size is not None:
        assert train_size >= k, (train_size, k)
        sample = _collect_sample(corpus, train_size, id_col, vec_col, salt)
        centroids = _lloyd_numpy(sample, sample[:k].copy(), iters)
        assignments = vecs.select(
            id_col, _assign_udf(centroids)(F.col(vec_col)).alias("cell")
        )
        return centroids, assignments
    centroids = _init_centroids(corpus, k, id_col, vec_col, salt)
    dim = centroids.shape[1]

    for _ in range(iters):
        assigned = vecs.select(
            _assign_udf(centroids)(F.col(vec_col)).alias("cell"),
            F.posexplode(vec_col).alias("dim", "component"),
        )
        rows = (
            assigned.groupBy("cell", "dim")
            .agg(F.avg("component").alias("mean"))
            .collect()
        )
        new = centroids.copy()  # empty cells keep their old centroid
        sums = np.zeros((k, dim))
        seen = np.zeros(k, dtype=bool)
        for r in rows:
            sums[r["cell"], r["dim"]] = r["mean"]
            seen[r["cell"]] = True
        new[seen] = sums[seen]
        centroids = new

    assignments = vecs.select(
        id_col, _assign_udf(centroids)(F.col(vec_col)).alias("cell")
    )
    return centroids, assignments


def kmeans_summary(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster sizes + within-cluster inertia from a finished fit — the
    registrable query form. Inertia is recomputed cluster-side with the
    same Arrow kernel pattern (sum of squared distances to the final
    centroid), one groupBy."""
    centroids, assignments = kmeans_fit(corpus, k=k, iters=iters,
                                        id_col=id_col, vec_col=vec_col)
    cent = centroids

    @pandas_udf("double")
    def sqdist(emb: pd.Series, cell: pd.Series) -> pd.Series:
        x = np.array(emb.tolist(), dtype=np.float64)
        c = cent[cell.to_numpy()]
        d = x - c
        return pd.Series((d * d).sum(axis=1))

    scored = corpus.select(id_col, vec_col).join(assignments, id_col).select(
        "cell", sqdist(F.col(vec_col), F.col("cell")).alias("sq")
    )
    return (
        scored.groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum("sq"), 2).alias("inertia"),
        )
        .orderBy("cell")
    )


def lloyd_reference(
    vectors: List[List[float]], init: np.ndarray, iters: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Plain-numpy Lloyd for the property test: same init, same
    tie-breaking, same empty-cell rule."""
    x = np.array(vectors, dtype=np.float64)
    cent = init.copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cells = np.argmin(d, axis=1)
        new = cent.copy()
        for c in range(cent.shape[0]):
            members = x[cells == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cent = new
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, np.argmin(d, axis=1)
