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
