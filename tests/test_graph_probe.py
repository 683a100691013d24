"""Iterative-graph family: checkpoint-cadence lineage bound + the
committed scale-probe record (round-7 item #5).

The four Pregel-shaped loops (x_bfs_hops, x_sssp_bellman,
x_pagerank_exact, x_temporal_reach) localCheckpoint their carried
frame every round; without that the analyzed plan accretes one
join+agg layer PER ROUND and a 100-iteration run compiles a
100-layer plan (and re-executes the whole history on failure).
The lineage test pins the discipline structurally: the FINAL frame's
analyzed plan must contain at most one Join, whatever the round
count — a regression that drops a checkpoint shows up as
rounds-proportional Join nodes immediately.

The probe-record test keeps tools/probe_results/probe_graph.json
honest against drift: per-op edge-throughput at 16x replication must
be >= the 1x number (the committed runs measured 2-24x BETTER —
fixed scheduling overhead amortizes; a recorded slowdown would mean
a hidden quadratic crept in and the probe needs re-running).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

PROBE = Path(__file__).parent.parent / "tools" / "probe_results" / "probe_graph.json"
GRAPH_QUERIES = ["x_bfs_hops", "x_sssp_bellman", "x_pagerank_exact", "x_temporal_reach"]


@pytest.mark.parametrize("name", GRAPH_QUERIES)
def test_iterative_plan_lineage_is_checkpoint_bounded(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().analyzed().toString()
    n_joins = plan.count("Join ")
    assert n_joins <= 1, (
        f"{name}: analyzed plan holds {n_joins} Join nodes — a dropped "
        f"localCheckpoint lets the per-round join+agg lineage accrete"
    )


def test_probe_record_shows_no_superlinear_blowup():
    recs = json.loads(PROBE.read_text())
    by_op: dict[str, dict[int, dict]] = {}
    for r in recs:
        by_op.setdefault(r["op"], {})[r["factor"]] = r
    assert set(by_op) == set(GRAPH_QUERIES)
    for op, facs in by_op.items():
        assert {1, 4, 16} <= set(facs), op
        r1, r16 = facs[1], facs[16]
        assert r16["n_edges"] == 16 * r1["n_edges"], op
        # per-round frontier scales exactly with the disjoint copies
        f1 = [x["frontier"] for x in r1["rounds"]]
        f16 = [x["frontier"] for x in r16["rounds"]]
        assert f16 == [16 * x for x in f1], op
        assert (
            r16["edge_rows_per_sec_per_round"] >= r1["edge_rows_per_sec_per_round"]
        ), f"{op}: throughput degraded at 16x — rerun tools/probe_graph.py"
