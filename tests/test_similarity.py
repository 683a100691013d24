"""E3 similarity-search checks: brute force vs numpy ground truth, and
recall of the two approximate scale paths (hyperplane LSH, IVF)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF, "embeddings").cache()


def _numpy_topk(emb_rows, query_ids, k=3):
    ids = np.array([r.vec_id for r in emb_rows])
    mat = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid in query_ids:
        qv = mat[ids == qid][0]
        sims = mat @ qv
        order = [
            (round(-s, 4), i)
            for s, i in zip(sims, ids)
            if i != qid
        ]
        order.sort()
        out[qid] = [i for _, i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb):
    rows = emb.collect()
    expected = _numpy_topk(rows, [0, 1, 2, 3, 4], k=3)
    got = similarity.brute_force_topk(emb.filter(F.col("vec_id") < 5), emb, k=3).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert by_q == expected


def test_ivf_recall_on_corpus(spark, emb):
    """Multi-probe IVF on the test corpus: probing 6/16 cells must
    recover the exact top-k here (small corpus, wide probes)."""
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.ivf_topk(queries, emb, n_centroids=16, n_probe=6, k=3).collect()
    truth = similarity.brute_force_topk(queries, emb, k=3).collect()
    t = {(r.query_id, r.neighbor_id) for r in truth}
    g = {(r.query_id, r.neighbor_id) for r in got}
    assert len(t & g) / len(t) >= 0.8


def test_multitable_lsh_recall_on_planted_clusters(spark):
    """Hyperplane LSH is a *near-duplicate* detector: on planted clusters
    (base vector + small noise) multi-table OR-amplification must
    recover most true same-cluster neighbors. Uniform random vectors
    (sim ~ 0) are the adversarial case and not what LSH promises."""
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for _ in range(20):  # 20 clusters x 4 members
        base = rng.randn(64)
        for _ in range(4):
            v = base + 0.15 * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 4 == 0)  # one query per cluster
    tables = [rng.randn(4, 64).tolist() for _ in range(8)]
    got = similarity.lsh_topk(queries, df, tables, k=3).collect()
    truth = similarity.brute_force_topk(queries, df, k=3).collect()
    t = {(r.query_id, r.neighbor_id) for r in truth}
    g = {(r.query_id, r.neighbor_id) for r in got}
    assert len(t & g) / len(t) >= 0.8


def test_cosine_self_similarity(spark, emb):
    """cos(v, v) == 1 for every vector (fold + norm sanity)."""
    one = emb.select(
        similarity.cosine(F.col("embedding"), F.col("embedding")).alias("c")
    )
    bad = one.filter(F.abs(F.col("c") - 1.0) > 1e-9).count()
    assert bad == 0


def test_ivf_kmeans_centroids_recall(spark, emb):
    """Spherical-kmeans centroid mode: recall floor at a tight probe
    budget, plus balanced cells (the property that actually bounds scan
    cost at scale — 'first' data-vector centroids can luck into high
    recall on planted blobs, but carry no balance guarantee)."""
    queries = emb.filter(F.col("vec_id") < 5)
    truth = similarity.brute_force_topk(queries, emb, k=3).collect()
    t = {(r.query_id, r.neighbor_id) for r in truth}

    got = similarity.ivf_topk(
        queries, emb, n_centroids=10, n_probe=3, k=3, centroid_mode="kmeans"
    ).collect()
    recall = len(t & {(r.query_id, r.neighbor_id) for r in got}) / len(t)
    assert recall >= 0.75  # deterministic fit: measured 0.80 on this corpus

    from public_transit_status_with_apache_kafka_spark.operators import kmeans as km

    unit = emb.select(
        "vec_id", similarity._to_double(F.col("embedding")).alias("e2")
    ).select(
        "vec_id",
        F.transform("e2", lambda x: x / similarity.l2_norm(F.col("e2"))).alias(
            "embedding"
        ),
    )
    _, assignments = km.kmeans_fit(unit, k=10, iters=3)
    sizes = [r["count"] for r in assignments.groupBy("cell").count().collect()]
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))


def test_quantized_topk_recall_floor(spark):
    """int8-storage ANN: top-3 neighbors from dequantized codes must
    overlap >= 2/3 with the exact float top-3 for every query (the
    scale/2 reconstruction error rarely reorders near-ties beyond
    that), and ranks/ids must be deterministic."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = brute_force_topk(queries, emb, k=3)
    approx = quantized_topk(queries, emb, k=3)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ap) == set(ex) and len(ex) == 5
    for qid in ex:
        assert len(ex[qid] & ap[qid]) >= 2, (qid, ex[qid], ap[qid])
    # determinism
    again = {(r.query_id, r.neighbor_id, r.rnk) for r in quantized_topk(queries, emb, k=3).collect()}
    assert again == {(r.query_id, r.neighbor_id, r.rnk) for r in approx.collect()}


def test_quantized_topk_recall_floor_at_16x_replication(spark):
    """VERDICT r2 #6: quantized_topk caps candidates at 64 per Arrow
    batch per query (similarity.py) — correct at test SF, but the cap
    must not erode recall as the corpus grows and splits across many
    batches/partitions. Replicate the sf0.01 embeddings 16x (distinct
    ids, scale-probe style): every query then has 15 exact replicas
    scattered across partitions, and the approx top-3 must still find
    sim≈1.0 neighbors — each neighbor's EXACT float similarity must be
    within 0.01 of the true 3rd-best (sim-recall@3, robust to
    quantization near-tie reordering)."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        quantized_topk,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    big, copies = emb, 1
    while copies < 16:
        big = big.unionByName(
            big.withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000 * copies))
        )
        copies *= 2
    big = big.localCheckpoint()
    queries = big.filter("vec_id < 5")

    rows = big.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims_by_id = {}
    for qid in [r.vec_id for r in queries.collect()]:
        qv = mat[ids == qid][0]
        s = mat @ qv
        mask = ids != qid
        sims_by_id[qid] = (dict(zip(ids[mask], s[mask])), np.sort(s[mask])[::-1][:3])

    got = {}
    for r in quantized_topk(queries, big, k=3).collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(got) == set(sims_by_id) and all(len(v) == 3 for v in got.values())
    for qid, neighbors in got.items():
        exact_sims, top3 = sims_by_id[qid]
        floor = top3[-1] - 0.01
        for nid in neighbors:
            assert exact_sims[nid] >= floor, (qid, nid, exact_sims[nid], floor)
        # the replicas (sim 1.0) must not have been capped away
        assert max(exact_sims[n] for n in neighbors) >= 0.999, (qid, neighbors)


def test_pq_topk_recall_floor(spark):
    """Product-quantization ANN, shortlist + exact re-rank: the ADC
    shortlist must surface the true neighborhood (top-3 overlap >= 2/3
    with exact brute force for every query after the refine stage) and
    ranks must be deterministic."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq
    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = brute_force_topk(queries, emb, k=3)
    approx = pq.pq_topk(queries, emb, k=3)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ap) == set(ex) and len(ex) == 5
    for qid in ex:
        assert len(ex[qid] & ap[qid]) >= 2, (qid, ex[qid], ap[qid])
    again = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in pq.pq_topk(queries, emb, k=3).collect()
    }
    assert again == {(r.query_id, r.neighbor_id, r.rnk) for r in approx.collect()}


def test_pq_fit_partition_invariant(spark):
    """Lloyd on subspaces must produce identical codebooks whatever the
    input partitioning (means are exact averages; init is salted-hash
    deterministic)."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    b1 = pq.pq_fit(emb, m=4, ksub=8, iters=2)
    b2 = pq.pq_fit(emb.repartition(7), m=4, ksub=8, iters=2)
    assert np.allclose(b1, b2, atol=1e-12)


def test_ivfpq_topk_recall_floor(spark):
    """IVF-PQ: probing 6 of 16 cells plus code-only ADC scoring must
    still surface the true neighborhood — >= 1/3 overlap with exact
    brute force per query, >= 8/15 overall — and stay deterministic."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq
    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter("vec_id < 5")
    ex = {}
    for r in brute_force_topk(queries, emb, k=3).collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    rows1 = pq.ivfpq_topk(queries, emb, k=3).collect()
    for r in rows1:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ap) == set(ex) and len(ex) == 5
    total = 0
    for qid in ex:
        got = len(ex[qid] & ap[qid])
        assert got >= 1, (qid, ex[qid], ap[qid])
        total += got
    assert total >= 8, total


def _rows_set(df):
    return {(r.query_id, r.rnk, r.neighbor_id, r.sim) for r in df.collect()}


def test_pq_chunked_equals_unchunked(spark):
    """The round-5 bounded query path (query_chunk smaller than the
    query count -> multi-chunk: persisted code index, per-chunk LUT
    broadcasts destroyed between chunks) must be EXACTLY the unchunked
    result — per-query independence makes chunking a pure partitioning
    of the work, and (sim desc, neighbor asc) ranks are deterministic."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 7")
    whole = _rows_set(pq.pq_topk(queries, emb, k=3, m=4, ksub=8, iters=2))
    chunked = _rows_set(
        pq.pq_topk(queries, emb, k=3, m=4, ksub=8, iters=2, query_chunk=3)
    )
    assert chunked == whole and len({q for q, *_ in whole}) == 7


def test_ivfpq_chunked_equals_unchunked(spark):
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 7")
    kw = dict(k=3, n_cells=8, n_probe=4, m=4, ksub=8, iters=2)
    whole = _rows_set(pq.ivfpq_topk(queries, emb, **kw))
    chunked = _rows_set(pq.ivfpq_topk(queries, emb, query_chunk=3, **kw))
    assert chunked == whole and len({q for q, *_ in whole}) == 7


def test_quantized_chunked_equals_unchunked(spark):
    from public_transit_status_with_apache_kafka_spark.io_util import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 7")
    whole = {
        (r.query_id, r.rnk, r.neighbor_id, r.sim)
        for r in similarity.quantized_topk(queries, emb, k=3).collect()
    }
    chunked = {
        (r.query_id, r.rnk, r.neighbor_id, r.sim)
        for r in similarity.quantized_topk(queries, emb, k=3, query_chunk=3).collect()
    }
    assert chunked == whole and len({q for q, *_ in whole}) == 7


def test_empty_query_side_returns_empty(spark):
    """Zero queries must yield an empty, correctly-typed result (the
    chunked driver's no-chunk branch), not an error."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 0")
    out = pq.pq_topk(queries, emb, k=3, m=4, ksub=8, iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rnk", "neighbor_id", "sim",
    ]


def test_ivfpq_recall_floor_at_16x_replication(spark):
    """VERDICT r4 #7 scale probe as an assertion: replicate the sf0.01
    embeddings 16x (distinct ids) — every query then has 15 exact
    replicas scattered across cells' partitions — and IVF-PQ's
    probe + code-only ADC shortlist + exact re-rank must still surface
    sim≈1.0 neighbors: each returned neighbor's EXACT similarity within
    0.02 of the true 3rd-best, and at least one replica found."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    big, copies = emb, 1
    while copies < 16:
        big = big.unionByName(
            big.withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000 * copies))
        )
        copies *= 2
    big = big.localCheckpoint()
    queries = big.filter("vec_id < 5")

    rows = big.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims_by_id = {}
    for qid in [r.vec_id for r in queries.collect()]:
        qv = mat[ids == qid][0]
        s = mat @ qv
        mask = ids != qid
        sims_by_id[qid] = (dict(zip(ids[mask], s[mask])), np.sort(s[mask])[::-1][:3])

    got = {}
    out = pq.ivfpq_topk(
        queries, big, k=3, n_cells=16, n_probe=8, m=4, ksub=16, iters=2
    )
    for r in out.collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(got) == set(sims_by_id) and all(len(v) == 3 for v in got.values())
    for qid, neighbors in got.items():
        exact_sims, top3 = sims_by_id[qid]
        floor = top3[-1] - 0.02
        for nid in neighbors:
            assert exact_sims[nid] >= floor, (qid, nid, exact_sims[nid], floor)
        assert max(exact_sims[n] for n in neighbors) >= 0.999, (qid, neighbors)


def test_pq_sampled_training_recall_and_invariance(spark):
    """train_size (driver-side Lloyd on a bounded salted-hash sample —
    the FAISS production shape) must preserve the recall floor and stay
    deterministic across input partitionings (sample selection is a
    hash order, not a partition order)."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq
    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter("vec_id < 5")
    ex = {}
    for r in brute_force_topk(queries, emb, k=3).collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = pq.pq_topk(queries, emb, k=3, train_size=512)
    ap = {}
    rows1 = got.collect()
    for r in rows1:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ap) == set(ex) and len(ex) == 5
    for qid in ex:
        assert len(ex[qid] & ap[qid]) >= 2, (qid, ex[qid], ap[qid])
    rows2 = pq.pq_topk(
        queries, emb.repartition(7), k=3, train_size=512
    ).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_kmeans_sampled_training_invariant(spark):
    """Sampled kmeans centroids must be partitioning-invariant and equal
    a driver-side numpy rerun of the same sample + Lloyd rules."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators.kmeans import (
        kmeans_fit,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    c1, _ = kmeans_fit(emb, k=4, iters=2, train_size=64)
    c2, _ = kmeans_fit(emb.repartition(7), k=4, iters=2, train_size=64)
    assert np.allclose(c1, c2, atol=0)


def test_hamming_topk_matches_numpy(spark, emb):
    """Binary-signature Hamming top-k == a packed-bits numpy reference
    (exact integer distances — no rounding surface at all)."""
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    bits = np.array([[1 if x > 0 else 0 for x in r.embedding] for r in rows], dtype=np.int64)
    expected = {}
    for qid in [0, 1, 2, 3, 4]:
        qb = bits[ids == qid][0]
        ham = (bits != qb).sum(axis=1)
        order = sorted((int(h), int(i)) for h, i in zip(ham, ids) if i != qid)
        expected[qid] = [(i, h) for h, i in order[:3]]
    got = similarity.hamming_topk(
        emb.filter(F.col("vec_id") < 5), emb, dim=64, k=3
    ).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.hamming))
    assert by_q == expected


def test_hamming_signature_packing_roundtrip(spark):
    """Packed words reproduce the exact sign-bit pattern, including the
    word boundary (bit 31 -> w0's top bit, bit 32 -> w1's bit 0)."""
    vec = [0.0] * 64
    vec[0] = 1.0   # w0 bit 0
    vec[31] = 0.5  # w0 bit 31
    vec[32] = 2.0  # w1 bit 0
    vec[63] = 1e-9 # w1 bit 31 (strictly > 0 counts)
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = similarity.binary_signatures(df, dim=64).collect()[0]
    assert row.w0 == (1 << 0) | (1 << 31)
    assert row.w1 == (1 << 0) | (1 << 31)


def test_matryoshka_topk_recall_and_rerank(spark, emb):
    """Matryoshka two-stage: exact-match vs a numpy reference of the
    same algorithm (prefix shortlist -> full re-rank), and recall vs
    full brute force must beat prefix-only search."""
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)

    def cos_round(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    expected = {}
    for qid in [0, 1, 2, 3, 4]:
        qv = mat[ids == qid][0]
        pre = sorted(
            ((-cos_round(qv[:16], v[:16]), int(i)) for i, v in zip(ids, mat) if i != qid)
        )[:20]
        rer = sorted(
            (-cos_round(qv, mat[ids == i][0]), int(i)) for _, i in pre
        )[:3]
        expected[qid] = [i for _, i in rer]
    got = similarity.matryoshka_topk(
        emb.filter(F.col("vec_id") < 5), emb, prefix_dim=16, shortlist=20, k=3
    ).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert by_q == expected

    # fixture embeddings are iid noise (prefix carries little signal),
    # so recall vs brute force is only sanity-bounded: well above the
    # random-shortlist expectation of ~3*20/497 hits per query
    brute = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") < 5), emb, k=3
    ).collect()
    bt: dict[int, set] = {}
    for r in brute:
        bt.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bt[q] & set(n)) for q, n in by_q.items())
    assert hits >= 3  # ~5x the random-shortlist expectation


def test_matryoshka_recall_on_nested_embeddings(spark):
    """On actual Matryoshka-STRUCTURED vectors (information front-loaded
    into the prefix dims, tail is small noise — what MRL training
    produces) the prefix shortlist must recover nearly all true
    neighbors."""
    rng = np.random.default_rng(11)
    n, dim = 300, 64
    base = rng.normal(0, 1, size=(n, 16))
    mat = np.concatenate(
        [base, 0.1 * rng.normal(0, 1, size=(n, dim - 16))], axis=1
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = similarity.matryoshka_topk(
        df.filter(F.col("vec_id") < 5), df, prefix_dim=16, shortlist=20, k=3
    ).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    brute = similarity.brute_force_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    bt: dict[int, set] = {}
    for r in brute:
        bt.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bt[q] & by_q.get(q, set())) for q in bt)
    total = sum(len(v) for v in bt.values())
    assert hits >= 0.85 * total, (hits, total)


def test_ann_recall_report_pins_methods(spark):
    """The self-measuring recall report: brute force recalls itself at
    exactly 1.0; the reconstruction-based methods (int8, PQ) stay near
    exact; every structural method clears a floor far above the
    ~3/N random-shortlist expectation."""
    import __spark_entry__ as entry

    rows = {
        r.method: r
        for r in entry.queries()["e3_ann_recall_report"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["brute_force"].recall_at_3 == 1.0
    assert rows["brute_force"].hits == rows["brute_force"].n_truth
    assert rows["int8"].recall_at_3 >= 0.8
    assert rows["pq"].recall_at_3 >= 0.8
    for m in ("hamming", "matryoshka", "ivfpq", "ivf_kmeans_frozen"):
        assert rows[m].recall_at_3 >= 0.15, m


def test_partial_topk_exchange_flat_at_16x(spark):
    """VERDICT r5 #1 done-criterion: the mergeable partial top-k must
    make the post-scan exchange corpus-size-INDEPENDENT per partition.
    partition_topk's output (== the rows the merge groupBy shuffles) is
    bounded by n_partitions * n_queries * k at ANY corpus size; the
    scored set it truncates is corpus * n_queries rows. Assert the
    bound at 1x and at 16x replication, and that the reduction factor
    grows with the corpus (flat survivors per partition while scored
    rows per partition grow 16x)."""
    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        cosine,
        partition_topk,
    )

    k = 3
    emb = load(spark, "/root/testdata/sf0.01", "embeddings")

    def survivors_and_bound(corpus):
        q = corpus.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
        )
        c = corpus.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
        )
        scored = c.join(
            F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
        ).select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
        )
        n_parts = scored.select(F.spark_partition_id().alias("p")).distinct().count()
        n_out = partition_topk(scored, k, "sim", ascending=False).count()
        n_scored = scored.count()
        return n_out, n_parts * 5 * k, n_scored

    out1, bound1, scored1 = survivors_and_bound(emb)
    assert out1 <= bound1, (out1, bound1)

    big, copies = emb, 1
    while copies < 16:
        big = big.unionByName(
            big.withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000 * copies))
        )
        copies *= 2
    big = big.localCheckpoint()
    out16, bound16, scored16 = survivors_and_bound(big)
    assert out16 <= bound16, (out16, bound16)
    # the scored set grew ~16x; the shuffled survivor set must not —
    # its growth is capped by partition-count growth, not row growth
    assert scored16 >= 10 * scored1
    assert out16 / max(out1, 1) < scored16 / scored1


def test_ann_store_roundtrip_matches_fresh_build(spark, tmp_path):
    """Build-once store (VERDICT r5 #3): persisting an IVF-PQ index and
    loading it back must serve results IDENTICAL to querying the
    just-built in-memory index — and a second build call with the same
    store_dir must load (not retrain), proven by array identity."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    store = str(tmp_path / "ivfpq_store")

    fresh = pq.ivfpq_build(emb, n_cells=8, m=4, ksub=8, iters=2, train_size=256)
    built = pq.ivfpq_build(
        emb, n_cells=8, m=4, ksub=8, iters=2, train_size=256, store_dir=store
    )
    loaded = pq.ivfpq_build(
        emb, n_cells=8, m=4, ksub=8, iters=2, train_size=256, store_dir=store
    )
    assert np.array_equal(built.books, loaded.books)
    assert np.array_equal(built.cn, loaded.cn)
    assert np.array_equal(fresh.books, loaded.books)

    kw = dict(k=3, n_probe=4)
    r_fresh = {
        tuple(r) for r in pq.ivfpq_query(fresh, queries, emb, **kw).collect()
    }
    r_loaded = {
        tuple(r) for r in pq.ivfpq_query(loaded, queries, emb, **kw).collect()
    }
    assert r_fresh == r_loaded and len({q for q, *_ in r_fresh}) == 5


def test_ann_index_staleness_contract(spark, tmp_path):
    """Round-7 #8: a persisted ANN store records the corpus fingerprint
    (row count + order-independent id checksum) at build; loads verify
    it. Same corpus -> served from the store (no retrain); mutated
    corpus -> rebuild by default, StaleIndexError when serving-only."""
    import os

    from public_transit_status_with_apache_kafka_spark.operators import pq

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    store = str(tmp_path / "pq_store")
    pq.pq_build(emb, m=4, ksub=16, iters=2, train_size=256, store_dir=store)
    npz = os.path.join(store, "arrays.npz")
    mt0 = os.path.getmtime(npz)

    # unchanged corpus: loads, does not retrain (store untouched)
    idx = pq.pq_build(emb, m=4, ksub=16, iters=2, train_size=256, store_dir=store)
    assert os.path.getmtime(npz) == mt0
    assert np.array_equal(idx.corpus_fp, pq.corpus_fingerprint(emb))

    # fingerprint is order-independent but row- and id-sensitive
    fp = pq.corpus_fingerprint(emb)
    assert np.array_equal(fp, pq.corpus_fingerprint(emb.repartition(7)))
    mutated = emb.filter(F.col("vec_id") != 3)
    assert not np.array_equal(fp, pq.corpus_fingerprint(mutated))

    # serving-only deployment refuses a stale store...
    with pytest.raises(pq.StaleIndexError):
        pq.pq_build(
            mutated, m=4, ksub=16, iters=2, train_size=256,
            store_dir=store, on_stale="error",
        )
    assert os.path.getmtime(npz) == mt0  # refused, not rewritten

    # ...and the default rebuilds + re-fingerprints
    idx2 = pq.pq_build(
        mutated, m=4, ksub=16, iters=2, train_size=256, store_dir=store
    )
    assert os.path.getmtime(npz) > mt0
    assert np.array_equal(idx2.corpus_fp, pq.corpus_fingerprint(mutated))
    assert idx2.index.count() == mutated.count()


def test_stream_ann_ingest_full_topk_and_single_ingest(spark):
    """e3_stream_ann_ingest must return the COMPLETE top-k (5 queries x
    k=3): the inner join of stream-served vs batch-served results only
    reaches 15 rows if every streamed vector landed in the right cell
    exactly once (the planted redelivery dropped) and the serve paths
    agree on every (neighbor, rank, sim)."""
    import __spark_entry__ as entry

    rows = entry.queries()["e3_stream_ann_ingest"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 15
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values()), per_q


def test_mmr_rerank_matches_numpy_reference_and_demotes_redundant(spark):
    """MMR must equal a pure-numpy greedy reference on a planted
    fixture, and a near-duplicate of the best hit must be DEMOTED below
    a less-relevant-but-diverse candidate."""
    import numpy as np

    from public_transit_status_with_apache_kafka_spark.operators.similarity import (
        mmr_rerank,
    )

    dim = 8

    def v(*pairs):
        x = [0.0] * dim
        for i, val in pairs:
            x[i] = val
        return x

    # query 100 = axis 0. corpus: 1 = axis0+axis2 mix (best hit, but NOT
    # equal to the query — otherwise redundancy-to-1 == relevance for
    # every candidate and no lambda can reorder); 2 = near-clone of 1;
    # 3 = axis0+axis1 mix (less relevant, diverse from 1); 4 = axis1.
    rows = [
        (100, v((0, 1.0)), 0),
        (1, v((0, 0.9), (2, 0.4)), 0),
        (2, v((0, 0.89), (2, 0.41)), 0),
        (3, v((0, 0.7), (1, 0.7)), 0),
        (4, v((1, 1.0)), 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = mmr_rerank(
        emb.filter("vec_id = 100"), emb, k=3, pool=4, lam=0.5
    ).collect()
    order = [r.neighbor_id for r in out]
    assert order[0] == 1  # pure relevance first
    # the clone (2) is MORE relevant than 3 but must rank BELOW it
    assert order.index(3) < order.index(2)

    # numpy reference replay of the same greedy
    vecs = {r[0]: np.array(r[1]) for r in rows}
    q = vecs[100] / np.linalg.norm(vecs[100])
    cand = sorted([1, 2, 3, 4])
    unit = {i: vecs[i] / np.linalg.norm(vecs[i]) for i in cand}
    qsim = {i: round(float(q @ unit[i]), 4) for i in cand}
    sel, avail = [], set(cand)
    for _ in range(3):
        best = None
        for i in sorted(avail):
            red = max(
                (round(round(float(unit[i] @ unit[j]), 6) * 1e6) for j in sel),
                default=0,
            )
            # the kernel's exact-integer scoring (lam=0.5 -> 5/10):
            # 1e-7 units, no float rounding anywhere
            sc = 100 * 5 * round(qsim[i] * 1e4) - 5 * red
            if best is None or sc > best[1] or (sc == best[1] and i < best[0]):
                best = (i, sc)
        sel.append(best[0])
        avail.discard(best[0])
    assert order == sel


def test_ivf_kmeans_store_serves_from_scratch_results(spark, tmp_path):
    """Round 9: the persisted IVF-kmeans index (build/serve split) must
    serve exactly the from-scratch ivf_topk(kmeans) results — the fit
    is deterministic and shared, the store adds only persistence. Also:
    a second build call with the same dir LOADS (no refit), and the
    loaded index carries the corpus fingerprint."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import similarity

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(n_centroids=16, n_probe=6, k=3)

    scratch = {
        tuple(r)
        for r in similarity.ivf_topk(
            queries, emb, centroid_mode="kmeans", **kw
        ).collect()
    }

    store = str(tmp_path / "ivfkm_store")
    built = similarity.ivf_kmeans_build(emb, n_centroids=16, store_dir=store)
    served = {
        tuple(r)
        for r in similarity.ivf_kmeans_serve(built, queries, n_probe=6, k=3).collect()
    }
    assert served == scratch and len(served) == 15

    loaded = similarity.ivf_kmeans_build(emb, n_centroids=16, store_dir=store)
    import numpy as np

    assert np.array_equal(loaded.centroids, built.centroids)
    served2 = {
        tuple(r)
        for r in similarity.ivf_kmeans_serve(loaded, queries, n_probe=6, k=3).collect()
    }
    assert served2 == scratch


def test_ivf_kmeans_store_stale_detection(spark, tmp_path):
    """The ivfkm store carries the corpus fingerprint like pq/ivfpq: a
    store built on one corpus refuses to serve (on_stale='error') or
    silently rebuilds (default) when the corpus changes."""
    import pytest

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import similarity
    from public_transit_status_with_apache_kafka_spark.operators.pq import (
        StaleIndexError,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    old = emb.filter(F.col("vec_id") < 200)
    store = str(tmp_path / "ivfkm")
    similarity.ivf_kmeans_build(old, n_centroids=8, store_dir=store)

    with pytest.raises(StaleIndexError):
        similarity.ivf_kmeans_build(
            emb, n_centroids=8, store_dir=store, on_stale="error"
        )
    rebuilt = similarity.ivf_kmeans_build(emb, n_centroids=8, store_dir=store)
    assert rebuilt.index.count() == emb.count()
    # and the rebuilt store now loads clean under on_stale='error'
    loaded = similarity.ivf_kmeans_build(
        emb, n_centroids=8, store_dir=store, on_stale="error"
    )
    assert loaded.index.count() == emb.count()
