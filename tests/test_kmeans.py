"""Distributed k-means (operators/kmeans.py) vs a plain-numpy Lloyd
reference with identical init / tie-break / empty-cell rules."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long
from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.operators import kmeans

from conftest import SF_SMOKE

K, ITERS = 4, 3


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")


def test_matches_numpy_lloyd(spark, emb):
    init = kmeans._init_centroids(emb, K, "vec_id", "embedding", ":kmeans:v1")
    centroids, assignments = kmeans.kmeans_fit(emb, k=K, iters=ITERS)

    rows = emb.orderBy("vec_id").collect()
    ref_cent, ref_cells = kmeans.lloyd_reference(
        [r.embedding for r in rows], init, ITERS
    )
    # float-order differences between Spark's avg and numpy's mean stay
    # far below any decision boundary on this data
    assert np.allclose(centroids, ref_cent, atol=1e-8)

    got = {r.vec_id: r.cell for r in assignments.collect()}
    for r, cell in zip(rows, ref_cells):
        assert got[r.vec_id] == cell


def test_deterministic_across_partitionings(spark, emb):
    c1, a1 = kmeans.kmeans_fit(emb.repartition(7), k=K, iters=ITERS)
    c2, a2 = kmeans.kmeans_fit(emb.coalesce(1), k=K, iters=ITERS)
    assert np.allclose(c1, c2, atol=1e-8)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_summary_shape_and_totals(spark, emb):
    out = kmeans.kmeans_summary(emb, k=K, iters=ITERS).collect()
    assert [r.cell for r in out] == sorted(r.cell for r in out)
    assert sum(r.n_vectors for r in out) == emb.count()
    assert all(r.inertia >= 0 for r in out)


def test_init_is_salted_hash_spread(spark, emb):
    """Changing the salt re-rolls the seed set; same salt is stable."""
    a = kmeans._init_centroids(emb, K, "vec_id", "embedding", ":kmeans:v1")
    b = kmeans._init_centroids(emb, K, "vec_id", "embedding", ":kmeans:v1")
    c = kmeans._init_centroids(emb, K, "vec_id", "embedding", ":other:")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
