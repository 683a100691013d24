"""Global plan lint: blanket physical-plan bans swept over EVERY
registered batch query, generalizing test_plan_contracts' per-query
assertions into engine-wide invariants:

- no ``CartesianProduct`` anywhere — every intentional cross join must
  be a broadcast variant (a cartesian at 100 TB is a non-starter, and
  AQE can silently fall back to one when a broadcast hint is lost);
- no ``BatchEvalPython`` anywhere — row-at-a-time Python UDFs are the
  documented slow path; Python work must ride Arrow
  (MapInPandas/ArrowEvalPython) or stay JVM-side.

Streaming replays (the whole x3_ family — including
x3_stateful_stream_replay — and the x_stream_* queries) and the
generator pipeline are skipped: invoking them RUNS the stream, and the
plan of their driver-collected result rows is vacuous anyway; their
plan hygiene is pinned by their own tests. The ANN recall report is
skipped for runtime (it executes its searches at build time — its
components are linted individually and contract-pinned)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

SKIP_PREFIXES = ("x3_", "x_stream", "cta_fixture_dashboard_stream", "gen_scale")
SKIP = {"e3_ann_recall_report"}


def _unpartitioned_window(plan: str) -> bool:
    # windowspecdefinition(<partition cols,> <order col ASC|DESC ...>,
    # specifiedwindowframe(...)): when the FIRST argument is already an
    # ordering expression (carries ASC/DESC), the partition spec is
    # empty — the WindowExec that logs 'No Partition Defined' and
    # funnels the whole input through one task (round 9, VERDICT r8
    # #9: all bounded-frame rank attaches were rewritten onto
    # rank.attach_bounded_rank / stratified_cumsum, so the registry
    # must stay free of these)
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan):
        first = m.group(1)
        if " ASC" in first or " DESC" in first:
            return True
    return False


# per-table parquet scan budget (round 9): a plan that re-derives a
# shared subtree once per consumer re-SCANS the corpus once per
# consumer — x_kmv_intersection shipped at 18 events scans and
# e4_dsir_weights at 10 documents scans before their shared frames
# were localCheckpoint-ed. Legitimate multi-branch shapes (funnel
# stages, TPC-H correlated subqueries, two-pool retrieval fusions)
# sit at <= 5 today; anything above the budget is a lineage blowup.
MAX_SCANS_PER_TABLE = 6


def test_no_cartesian_row_udf_or_unpartitioned_window_in_any_plan(spark):
    import collections
    import re

    queries = entry.queries()
    names = [
        n for n in queries if not n.startswith(SKIP_PREFIXES) and n not in SKIP
    ]
    assert len(names) > 190  # the sweep really covers the registry
    cartesian, row_udf, bare_window, rescans = [], [], [], []
    for name in names:
        plan = (
            queries[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_udf.append(name)
        if _unpartitioned_window(plan):
            bare_window.append(name)
        scans = collections.Counter(
            re.findall(r"file:[^\s,\]]*?/(\w+)\.parquet", plan)
        )
        if scans and max(scans.values()) > MAX_SCANS_PER_TABLE:
            rescans.append((name, dict(scans)))
    assert not cartesian, f"CartesianProduct planned in: {cartesian}"
    assert not row_udf, f"row-at-a-time Python UDF planned in: {row_udf}"
    assert not bare_window, f"unpartitioned Window planned in: {bare_window}"
    assert not rescans, (
        f"per-table scan budget ({MAX_SCANS_PER_TABLE}) exceeded — "
        f"localCheckpoint the shared frame: {rescans}"
    )
