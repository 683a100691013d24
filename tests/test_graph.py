"""PageRank power iteration vs a dense numpy reference."""

from __future__ import annotations

import numpy as np

from public_transit_status_with_apache_kafka_spark.operators import graph


def ref_pagerank(edges: list[tuple[int, int]], iters: int, d: float = 0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, set] = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in nodes:
            if u in out:
                share = r[idx[u]] / len(out[u])
                for v in out[u]:
                    nxt[idx[v]] += share
            else:
                dangling += r[idx[u]]
        r = (1 - d) / n + d * dangling / n + d * nxt
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_reference(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (5, 1),
        (6, 6),  # self-loop
        (7, 1),  # 7 has in-degree 0; 8 below is dangling
        (1, 8),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in graph.pagerank(df, iters=12).collect()}
    exp = ref_pagerank(edges, iters=12)
    assert set(got) == set(exp)
    for u in exp:
        assert abs(got[u] - exp[u]) < 1e-6, (u, got[u], exp[u])
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved


def test_pagerank_partition_invariant(spark):
    edges = [(i, (i * 7) % 23) for i in range(100)] + [(i, (i + 1) % 50) for i in range(50)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = {r.node: r.rank for r in graph.pagerank(df, iters=6).collect()}
    r2 = {r.node: r.rank for r in graph.pagerank(df.repartition(13), iters=6).collect()}
    for u in r1:
        assert abs(r1[u] - r2[u]) < 1e-7


# ------------------------------------------------------ triangle census
import itertools
import random

from public_transit_status_with_apache_kafka_spark.operators.graph import triangle_stats



def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1 for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges_all = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    cc = (3 * tri * 1_000_000) // wedges_all if wedges_all else None
    return len(nodes), len(es), tri, cc


def _run(spark, edges):
    df = spark.createDataFrame(list(edges), "id_a long, id_b long")
    r = triangle_stats(df).first()
    return r.n_nodes, r.n_edges, r.n_triangles, r.clustering_micro


def test_clique_star_and_path(spark):
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))           # 4 triangles
    star = [(100, 100 + i) for i in range(1, 9)]                 # hub, 0 triangles
    path = [(200, 201), (201, 202), (202, 203)]                  # 0 triangles
    dup_and_loops = [(1, 2), (2, 1), (3, 3)]                     # must collapse/drop
    edges = k4 + star + path + dup_and_loops
    got = _run(spark, edges)
    assert got == _brute(edges)
    assert got[2] == 4  # exactly the K4 triangles


def test_random_graphs_match_brute_force(spark):
    rng = random.Random(61)
    for trial in range(3):
        n = 14 + trial * 3
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(n * 3)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _run(spark, edges) == _brute(edges), f"trial {trial}"


def _kcore_ref(edges, k):
    """Pure-python peeling ground truth: {node: core_degree}."""
    adj = {}
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_k_core_clique_survives_pendant_path_peels(spark):
    """A 4-clique with a pendant path: the 2-core is exactly the clique
    (degrees 3), the path peels away layer by layer."""
    from public_transit_status_with_apache_kafka_spark.operators.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + path, "id_a long, id_b long")
    nodes, rounds = k_core(df, k=2)
    got = {r.id: r.core_degree for r in nodes.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert rounds >= 2  # the 3-node tail peels over multiple rounds


def test_k_core_cycle_is_its_own_2core_and_3core_empty(spark):
    from public_transit_status_with_apache_kafka_spark.operators.graph import k_core

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cycle, "id_a long, id_b long")
    nodes, _ = k_core(df, k=2)
    assert {r.id: r.core_degree for r in nodes.collect()} == {i: 2 for i in range(6)}
    nodes3, _ = k_core(df, k=3)
    assert nodes3.count() == 0


def test_k_core_matches_reference_on_random_graphs(spark):
    """Randomized equivalence vs the pure-python peel, including
    duplicate and reversed edge noise (operator must canonicalize)."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.graph import k_core

    rng = random.Random(68014)
    for trial in range(3):
        n = rng.randint(8, 18)
        edges = []
        for _ in range(rng.randint(n, 3 * n)):
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                edges.append((u, v))
                if rng.random() < 0.3:
                    edges.append((v, u))  # reversed duplicate
        if not edges:
            continue
        k = rng.choice([2, 3])
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes, _ = k_core(df, k=k)
        got = {r.id: r.core_degree for r in nodes.collect()}
        assert got == _kcore_ref(edges, k), (trial, k)
