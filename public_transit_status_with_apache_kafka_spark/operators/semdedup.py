"""E2: SemDeDup — semantic deduplication by embedding clusters.

Public algorithm (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): k-means
the embedding space into enough clusters that each cluster fits in one
worker's memory, then inside each cluster remove all but one member of
every epsilon-ball (cosine similarity >= tau). Near-duplicate *meaning*
— paraphrases, templated rewrites, re-encodings — collapses even when
no n-gram is shared, which is exactly the miss-class of MinHash/SimHash
(operators/dedup.py). The reference pipeline has nothing comparable;
this is a north-star extension (SURVEY.md section 2.10).

Spark shape, sized for 100 TB:

- The k-means fit is operators/kmeans.py: per Lloyd round the corpus
  never moves — assignment is a map-side Arrow matmul, the update one
  partial-aggregable groupBy; driver traffic is the k x dim centroid
  matrix only. At web scale k grows with the corpus (the paper uses
  50k clusters for LAION) so the per-cluster member count stays
  bounded; here k is a parameter.
- The pairwise stage is ``applyInPandas`` grouped by cluster cell: one
  shuffle on the cell id, then an O(|cell|^2) normalized-matmul greedy
  scan INSIDE one task — never a corpus-level pair join
  (tests/test_plan_contracts.py pins the no-cartesian rule globally).
- Skew safety: a degenerate hot cell (all embeddings identical — the
  exact input a dedup job exists for) would otherwise become one
  unbounded task. Cells over ``max_cell`` members are deterministically
  sub-split by an id-hash before the grouped map, bounding every task;
  cross-sub duplicates within a hot cell survive (documented recall
  tradeoff, same knob as the paper's cluster granularity). The split
  threshold comes from a k-row cell-size aggregate, not a window.
- Greedy keep rule: ids ascending, keep a member iff its max cosine to
  all previously-kept members of its (cell, sub) group is < tau. The
  paper keeps the member farthest from the centroid; lowest-id-wins is
  the deterministic variant every other dedup op here uses, so
  manifests are reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from .kmeans import kmeans_fit

CHECKSUM_MOD = 1000003


def greedy_keep_reference(ids: np.ndarray, vecs: np.ndarray, tau: float) -> np.ndarray:
    """Plain-numpy greedy epsilon-ball scan (the per-group kernel and
    the property-test reference): returns a keep mask aligned to the
    input rows. ids ascending defines scan order; vecs need not be
    normalized."""
    x = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.maximum(norms, 1e-12)
    keep = np.zeros(len(ids), dtype=bool)
    kept: list[int] = []
    for i in np.argsort(np.asarray(ids), kind="stable"):
        if not kept or float((x[kept] @ x[i]).max()) < tau:
            kept.append(i)
            keep[i] = True
    return keep


def semdedup_flags(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 4096,
    train_size: int | None = None,
) -> DataFrame:
    """Per-member verdicts: (id, cell, sub, keep). One shuffle for the
    cluster assignment join, one k-row cell-size aggregate, one grouped
    map per (cell, sub). ``train_size`` forwards to kmeans_fit:
    sample-trained centroids (driver-side Lloyd, one collect job)
    instead of per-iteration distributed rounds — the paper's own shape
    at web scale; deduplication semantics are unchanged (different but
    equally valid cells)."""
    id_type = dict(corpus.dtypes)[id_col]
    _, assignments = kmeans_fit(
        corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        train_size=train_size,
    )
    members = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).join(assignments.withColumnRenamed(id_col, "id"), "id")
    # the cell-size aggregate AND the size join both consume members;
    # without lineage control the assignment kernel + corpus join would
    # execute twice (the lsh_candidate_pairs lesson — the aggregate
    # exchange differs from the join exchange, so Catalyst can't reuse)
    members = members.localCheckpoint(eager=False)

    # bound every grouped-map task: cells over max_cell split into
    # ceil(n/max_cell) deterministic id-hash sub-groups (k-row aggregate,
    # broadcast by AQE — never a window over the cell key)
    sizes = members.groupBy("cell").agg(F.count("*").alias("n_cell"))
    n_subs = F.ceil(F.col("n_cell") / F.lit(max_cell)).cast("int")
    members = members.join(sizes, "cell").withColumn(
        "sub",
        F.pmod(md5_long(F.col("id").cast("string")), n_subs).cast("int"),
    )

    local_tau = tau

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = greedy_keep_reference(
            pdf["id"].to_numpy(), np.array(pdf["vec"].tolist()), local_tau
        )
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "sub": pdf["sub"].to_numpy(),
                "keep": keep,
            }
        )

    return members.groupBy("cell", "sub").applyInPandas(
        dedup_group, schema=f"id {id_type}, cell int, sub int, keep boolean"
    )


def greedy_keep_int_reference(
    ids: np.ndarray,
    qvecs: np.ndarray,
    tau_num2: int = 81,
    tau_den2: int = 100,
) -> np.ndarray:
    """INTEGER-EXACT greedy epsilon-ball scan over vectors already on
    an integer grid: member i is similar to kept j iff

        dot(qi, qj) > 0  AND  tau_den2 * dot^2 >= tau_num2 * n2_i * n2_j

    (cos >= tau with tau^2 = tau_num2/tau_den2, cross-multiplied so no
    float ever divides or square-roots — the boundary case lands on an
    exact integer comparison in every engine). Same lowest-id-wins
    scan order as :func:`greedy_keep_reference`.

    dot^2 overflows int64 at 64-dim/2^20-grid scale (~4e27), so the
    per-candidate test runs VECTORIZED in float64 with a relative
    guard band: float64 carries ~2^-52 relative error while the
    guard is 1e-9, so any comparison the float path decides is decided
    correctly, and only pairs INSIDE the band (exact-boundary
    territory) fall back to exact Python-int arithmetic — a bounded
    task stays one numpy matmul + O(boundary) bigint checks instead of
    an O(|cell|^2) interpreted loop."""
    q = np.asarray(qvecs, dtype=np.int64)
    # the exactness argument (n2 in int64, dots exact in float64's 2^53
    # mantissa, guard-band math correct) requires bounded components;
    # a fixture outside the bound must fail loudly, not desynchronize
    # the Spark kernel from the DuckDB DOUBLE replay
    if q.size and int(np.abs(q).max()) >= 1 << 23:
        raise ValueError(
            "greedy_keep_int_reference: |component| >= 2^23 breaks the "
            "int64/float64 exactness bounds (got %d)" % int(np.abs(q).max())
        )
    n2 = (q * q).sum(axis=1)  # int64, <= dim * SCALE^2 < 2^53
    n2f = n2.astype(np.float64)
    keep = np.zeros(len(ids), dtype=bool)
    kept: list[int] = []
    band = 1e-9
    for i in np.argsort(np.asarray(ids), kind="stable"):
        dup = False
        if kept:
            dots = q[kept] @ q[i]  # int64, |dot| <= dim * SCALE^2 < 2^53
            d = dots.astype(np.float64)
            lhs = tau_den2 * d * d
            rhs = tau_num2 * float(n2[i]) * n2f[kept]
            pos = dots > 0
            if (pos & (lhs > rhs * (1.0 + band))).any():
                dup = True
            else:
                boundary = np.nonzero(pos & (lhs >= rhs * (1.0 - band)))[0]
                n2i = int(n2[i])
                for b in boundary:
                    dd = int(dots[b])
                    if tau_den2 * dd * dd >= tau_num2 * n2i * int(n2[kept[b]]):
                        dup = True
                        break
        if not dup:
            kept.append(int(i))
            keep[i] = True
    return keep


def semdedup_frozen_summary(
    corpus: DataFrame,
    tau_num2: int = 81,
    tau_den2: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 4096,
) -> DataFrame:
    """The ORACLE-EXACT registered form (round 10): cells come from the
    FROZEN pretrained centroids of operators/frozen_semdedup.py (the
    frozen_ann recipe — at 100 TB nobody re-fits the coarse quantizer
    per query; it is trained once and served) and every decision is
    integer arithmetic on the 2^20 grid:

    - quantize: q[i] = floor(x[i] * 2^20) — power-of-two scaling is
      EXACT on IEEE doubles, so both engines compute identical ints
      from identical parquet floats, with no rounding boundary at all.
    - assign: argmin_c (qc.qc - 2 q.qc) over int64, ties to the lower
      cell — replayable as a rank over an integer key.
    - greedy epsilon-ball: the cross-multiplied integer cosine test of
      :func:`greedy_keep_int_reference` (tau^2 = tau_num2/tau_den2).

    Same shuffle shape as :func:`semdedup_flags` (one grouped map per
    deterministically sub-split cell, never a pair join); the live
    k-means form stays the library's primary fit path
    (tests/test_semdedup.py pins both kernels)."""
    import pandas as pd  # noqa: F811 (local: matches module import)

    from .frozen_semdedup import CENTROIDS_Q, SCALE

    cent = np.asarray(CENTROIDS_Q, dtype=np.int64)
    cc2 = (cent * cent).sum(axis=1)  # int64

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        x = np.array(emb.tolist(), dtype=np.float64)
        q = np.floor(x * SCALE).astype(np.int64)
        if q.size and int(np.abs(q).max()) >= 1 << 23:
            raise ValueError(
                "semdedup_frozen quantize: |component| >= 2^23 breaks "
                "the int64 exactness bound of the cell-assign argmin"
            )
        d = cc2[None, :] - 2 * (q @ cent.T)  # int64 exact
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    id_type = dict(corpus.dtypes)[id_col]
    members = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        assign(F.col(vec_col)).alias("cell"),
    ).localCheckpoint(eager=False)

    sizes = members.groupBy("cell").agg(F.count("*").alias("n_cell"))
    n_subs = F.ceil(F.col("n_cell") / F.lit(max_cell)).cast("int")
    members = members.join(sizes, "cell").withColumn(
        "sub",
        F.pmod(md5_long(F.col("id").cast("string")), n_subs).cast("int"),
    )

    tn, td = tau_num2, tau_den2

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["vec"].tolist(), dtype=np.float64)
        q = np.floor(x * SCALE).astype(np.int64)
        keep = greedy_keep_int_reference(pdf["id"].to_numpy(), q, tn, td)
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "keep": keep,
            }
        )

    flags = members.groupBy("cell", "sub").applyInPandas(
        dedup_group, schema=f"id {id_type}, cell int, keep boolean"
    )
    kept = F.col("keep").cast("long")
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(kept).alias("n_kept"),
            F.sum(
                F.when(F.col("keep"), F.pmod(F.col("id"), F.lit(CHECKSUM_MOD)))
                .otherwise(0)
            )
            .cast("long")
            .alias("kept_checksum"),
        )
        .orderBy("cell")
    )


def semdedup_summary(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 4096,
    train_size: int | None = None,
) -> DataFrame:
    """Registrable form: per-cluster member/kept counts plus a checksum
    over the kept ids, so any change in the keep set is driver-visible."""
    flags = semdedup_flags(
        corpus, k=k, iters=iters, tau=tau,
        id_col=id_col, vec_col=vec_col, max_cell=max_cell,
        train_size=train_size,
    )
    kept = F.col("keep").cast("long")
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(kept).alias("n_kept"),
            F.sum(
                F.when(F.col("keep"), F.pmod(F.col("id"), F.lit(CHECKSUM_MOD)))
                .otherwise(0)
            )
            .cast("long")
            .alias("kept_checksum"),
        )
        .orderBy("cell")
    )
