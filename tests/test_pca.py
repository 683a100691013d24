"""PCA over quantized embeddings: exact integer moments (partition-
invariant by construction), numpy-pinned components and projections."""

from __future__ import annotations

import numpy as np

from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.operators import pca

SF = "/root/testdata/sf0.001"
DIM = 64


def _numpy_reference(rows):
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    q = np.floor(mat * pca.QUANT_SCALE)
    n = len(q)
    cov = (q.T @ q - np.outer(q.sum(0), q.sum(0)) / n) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:2]].T.copy()
    for c in comps:
        k = int(np.argmax(np.abs(c)))
        if c[k] < 0:
            c *= -1.0
    return q, comps, q.sum(0) / n


def test_second_moments_match_numpy_exactly(spark):
    emb = load(spark, SF, "embeddings")
    rows = emb.collect()
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    q = np.floor(mat * pca.QUANT_SCALE).astype(np.int64)
    expected = q.T @ q
    got = pca.second_moments(emb, dim=DIM).collect()
    assert len(got) == DIM * (DIM + 1) // 2
    for r in got:
        assert r.s == expected[r.i - 1, r.j - 1], (r.i, r.j)


def test_second_moments_partition_invariant(spark):
    emb = load(spark, SF, "embeddings")
    a = {(r.i, r.j): r.s for r in pca.second_moments(emb, dim=DIM).collect()}
    b = {
        (r.i, r.j): r.s
        for r in pca.second_moments(emb.repartition(7), dim=DIM).collect()
    }
    assert a == b


def test_pca_projection_matches_numpy(spark):
    emb = load(spark, SF, "embeddings")
    rows = emb.collect()
    q, comps, mean_q = _numpy_reference(rows)
    proj = ((q - mean_q) / pca.QUANT_SCALE) @ comps.T
    expected = {
        r.vec_id: (int(np.floor(p[0] * 1000)), int(np.floor(p[1] * 1000)))
        for r, p in zip(rows, proj)
    }
    got = {
        r.id: (r.pc1_milli, r.pc2_milli)
        for r in pca.pca_project(emb, dim=DIM, n_components=2).collect()
    }
    assert got == expected


def test_pca_components_capture_planted_direction(spark):
    """A corpus stretched along one axis must put PC1 on that axis."""
    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.01, size=(200, DIM))
    base[:, 5] += rng.normal(0, 1.0, size=200)  # dominant variance on dim 5
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    comps = pca.pca_components(df, dim=DIM, n_components=1)
    assert int(np.argmax(np.abs(comps[0]))) == 5
    assert abs(comps[0][5]) > 0.99


def test_frozen_projection_tracks_live_fit(spark):
    """e3_pca_frozen_project's matrix IS the live sf0.001 fit quantized
    to the 2^14 grid, so on the fit corpus the frozen projection must
    track the live one within the quantization budget:
    |delta| <= dim * max|centered| * 2^-14 * 1000 ≈ 8 milli (assert 16
    for slack). A larger gap means the frozen literals drifted from
    the fit they claim to freeze."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pca

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    live = {r["id"]: (r["pc1_milli"], r["pc2_milli"])
            for r in pca.pca_project(emb, dim=64, n_components=2).collect()}
    frozen = {r["id"]: (r["pc1_milli"], r["pc2_milli"])
              for r in pca.pca_project_frozen(emb).collect()}
    assert set(live) == set(frozen) and live
    for k in live:
        for a, b in zip(live[k], frozen[k]):
            assert abs(a - b) <= 16, (k, live[k], frozen[k])
