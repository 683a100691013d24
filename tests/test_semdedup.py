"""SemDeDup (operators/semdedup.py): greedy epsilon-ball verdicts vs the
plain-numpy reference, planted-duplicate collapse, determinism, and the
hot-cell sub-split bound."""

from __future__ import annotations

import numpy as np
import pytest

from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.operators import semdedup
from public_transit_status_with_apache_kafka_spark.operators.kmeans import kmeans_fit

from conftest import SF_SMOKE

K, ITERS, TAU = 4, 2, 0.9


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")


def test_flags_match_numpy_reference(spark, emb):
    """Per-member keep verdicts equal a driver-side numpy rerun of the
    greedy scan over the same cluster assignment."""
    flags = semdedup.semdedup_flags(emb, k=K, iters=ITERS, tau=TAU).collect()
    _, assignments = kmeans_fit(emb, k=K, iters=ITERS)
    cells = {r.vec_id: r.cell for r in assignments.collect()}
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    got = {r.id: r.keep for r in flags}
    assert set(got) == set(vecs)
    for cell in set(cells.values()):
        ids = np.array(sorted(i for i, c in cells.items() if c == cell))
        keep = semdedup.greedy_keep_reference(
            ids, np.array([vecs[i] for i in ids]), TAU
        )
        for i, k in zip(ids, keep):
            assert got[i] == k, f"vec {i} in cell {cell}"


def test_planted_duplicates_collapse(spark):
    """Exact copies of a vector land in one cell and only the lowest id
    survives; distant vectors all survive."""
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, base) for i in range(5)]  # 5 exact copies
    rows += [(10, [0.0, 1.0, 0.0, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flags = semdedup.semdedup_flags(
        df, k=2, iters=1, tau=0.99, id_col="vec_id", vec_col="embedding"
    ).collect()
    kept = sorted(r.id for r in flags if r.keep)
    assert 0 in kept and not any(i in kept for i in range(1, 5))
    assert 10 in kept and 11 in kept


def test_summary_deterministic(spark, emb):
    a = semdedup.semdedup_summary(emb, k=K, iters=ITERS, tau=TAU).collect()
    b = semdedup.semdedup_summary(emb, k=K, iters=ITERS, tau=TAU).collect()
    assert a == b
    assert sum(r.n_members for r in a) == emb.count()
    assert all(0 < r.n_kept <= r.n_members for r in a)


def test_hot_cell_sub_split_bounds_groups(spark):
    """A degenerate corpus (all identical embeddings -> one cell) still
    produces bounded groups: with max_cell=8, each sub keeps exactly one
    member, so the kept count equals the number of sub-groups, not 1 —
    the documented recall tradeoff of the skew bound."""
    n = 64
    rows = [(i, [1.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flags = semdedup.semdedup_flags(
        df, k=1, iters=1, tau=0.99, max_cell=8
    ).collect()
    subs = {r.sub for r in flags}
    assert len(subs) == 8  # ceil(64/8) deterministic sub-groups
    kept_per_sub = {}
    for r in flags:
        kept_per_sub.setdefault(r.sub, 0)
        kept_per_sub[r.sub] += int(r.keep)
    assert all(v == 1 for v in kept_per_sub.values())


def test_flags_partitioning_invariant(spark, emb):
    """Keep verdicts must not depend on input splits: k-means init and
    assignment are hash/tie-break deterministic, sub-groups are id-hash
    assigned, and the greedy scan orders by id."""
    a = sorted(map(tuple, semdedup.semdedup_flags(emb, k=K, iters=ITERS, tau=TAU).collect()))
    b = sorted(map(tuple, semdedup.semdedup_flags(
        emb.repartition(7), k=K, iters=ITERS, tau=TAU).collect()))
    assert a == b


def test_semdedup_16x_replication_bounded_and_invariant(spark, emb):
    """Scale probe as an assertion (VERDICT r4 #7): replicate the
    embeddings 16x with distinct ids — every cell is then 16x hotter —
    and the skew bound must still hold: no (cell, sub) grouped-map task
    sees more than ~max_cell members (id-hash split, 2x slack for hash
    variance), and keep verdicts stay identical across input
    partitionings at the replicated scale."""
    from pyspark.sql import functions as F

    big, copies = emb, 1
    while copies < 16:
        big = big.unionByName(
            big.withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000 * copies))
        )
        copies *= 2
    big = big.localCheckpoint()
    max_cell = 64
    flags = semdedup.semdedup_flags(
        big, k=K, iters=ITERS, tau=TAU, max_cell=max_cell
    )
    sizes = flags.groupBy("cell", "sub").count().collect()
    assert sizes and max(r["count"] for r in sizes) <= 2 * max_cell, max(
        r["count"] for r in sizes
    )
    a = sorted(map(tuple, flags.collect()))
    b = sorted(
        map(
            tuple,
            semdedup.semdedup_flags(
                big.repartition(7), k=K, iters=ITERS, tau=TAU, max_cell=max_cell
            ).collect(),
        )
    )
    assert a == b


def test_int_kernel_agrees_with_float_reference_off_boundary():
    """greedy_keep_int_reference (the frozen registered path) and
    greedy_keep_reference (the float kernel) decide identically when
    no pair's cosine sits within quantization distance of tau — i.e.
    everywhere except the epsilon-thin boundary the integer grid
    exists to make exact."""
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant near-duplicates (cos ~ 0.999) far from the 0.9 threshold
    vecs[10] = vecs[3] + 1e-3 * rng.randn(16)
    vecs[11] = vecs[3] - 1e-3 * rng.randn(16)
    ids = np.arange(60)
    q = np.floor(vecs * (1 << 20)).astype(np.int64)
    cos = vecs @ vecs.T
    off_boundary = np.all(
        (np.abs(cos - 0.9) > 1e-3) | np.eye(60, dtype=bool)
    )
    assert off_boundary, "fixture regression: a pair sits on the tau boundary"
    a = semdedup.greedy_keep_reference(ids, vecs, 0.9)
    b = semdedup.greedy_keep_int_reference(ids, q, 81, 100)
    assert (a == b).all()
    assert not b[10] and not b[11] and b[3]  # planted dups collapse


def test_frozen_summary_matches_int_reference(spark, emb):
    """semdedup_frozen_summary's per-cell counts/checksum equal a
    driver-side integer rerun: quantize, assign to the FROZEN
    centroids, greedy-scan with the cross-multiplied cosine — the same
    replay the DuckDB oracle performs."""
    from public_transit_status_with_apache_kafka_spark.operators.frozen_semdedup import (
        CENTROIDS_Q,
        SCALE,
    )

    out = {
        r.cell: (r.n_members, r.n_kept, r.kept_checksum)
        for r in semdedup.semdedup_frozen_summary(emb).collect()
    }
    rows = emb.collect()
    cent = np.asarray(CENTROIDS_Q, dtype=np.int64)
    cc2 = (cent * cent).sum(axis=1)
    ids = np.array([r.vec_id for r in rows])
    q = np.floor(
        np.array([r.embedding for r in rows], dtype=np.float64) * SCALE
    ).astype(np.int64)
    cells = np.argmin(cc2[None, :] - 2 * (q @ cent.T), axis=1)
    expect = {}
    for cell in sorted(set(cells.tolist())):
        m = cells == cell
        order = np.argsort(ids[m], kind="stable")
        cids, cq = ids[m][order], q[m][order]
        keep = semdedup.greedy_keep_int_reference(cids, cq, 81, 100)
        expect[cell] = (
            int(m.sum()),
            int(keep.sum()),
            int(sum(int(i) % semdedup.CHECKSUM_MOD for i in cids[keep])),
        )
    assert out == expect


def test_int_kernel_exact_fallback_decides_the_boundary():
    """With tau^2 = 1 (cos >= 1), parallel integer vectors sit EXACTLY
    on the cross-multiplied boundary (d^2 == n2_a * n2_b) — the float
    prefilter lands inside its guard band and the exact Python-int
    fallback must decide: equality means duplicate (>=), while a
    barely-off-parallel pair must survive."""
    ids = np.arange(3)
    # [2,0] and [3,0] are parallel (boundary equality -> dup);
    # [3,1] is off-parallel (exact check says keep)
    q = np.array([[2, 0], [3, 0], [3, 1]], dtype=np.int64)
    keep = semdedup.greedy_keep_int_reference(ids, q, 1, 1)
    assert keep.tolist() == [True, False, True]
    # and at 81/100 the same trio: cos(a, c) = 3/sqrt(10) ~= 0.9487 > 0.9
    # so c now collapses too
    keep2 = semdedup.greedy_keep_int_reference(ids, q, 81, 100)
    assert keep2.tolist() == [True, False, False]
