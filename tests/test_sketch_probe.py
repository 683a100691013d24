"""Pin the recorded sketch scale probe (tools/probe_sketch.py →
tools/probe_results/sketch_r09.jsonl): the committed evidence must show
BOUNDED sketch state at every replication factor — the property that
makes HLL/KMV the 100 TB distinct-count path — and estimation error
inside each sketch's envelope."""

from __future__ import annotations

import json
from pathlib import Path

RESULTS = Path(__file__).parent.parent / "tools" / "probe_results" / "sketch_r09.jsonl"


def _rows():
    return [json.loads(ln) for ln in RESULTS.read_text().splitlines() if ln.strip()]


def test_probe_recorded_for_all_factors():
    rows = _rows()
    by_op = {}
    for r in rows:
        by_op.setdefault(r["op"], set()).add(r["factor"])
    assert by_op["hll_registers+estimate"] == {1, 4, 16}
    assert by_op["kmv_bottom_k"] == {1, 4, 16}


def test_hll_state_flat_and_error_in_envelope():
    for r in _rows():
        if r["op"] != "hll_registers+estimate":
            continue
        # 5 event-type scopes x <= 256 registers, at EVERY factor
        assert r["register_rows_total"] <= 5 * 256, r
        assert r["max_registers_per_scope"] <= 256, r
        # 3 sigma of the m=256 standard error (1.04/16)
        assert r["max_rel_err"] < 3 * 1.04 / 16, r


def test_kmv_state_flat_and_error_in_envelope():
    for r in _rows():
        if r["op"] != "kmv_bottom_k":
            continue
        assert r["retained_rows_total"] <= 2 * r["k"], r
        # 4 sigma of the KMV standard error (~1/sqrt(k-1))
        assert r["max_rel_err"] < 4 / (r["k"] - 1) ** 0.5, r


def test_throughput_does_not_degrade_with_scale():
    """rows/sec at 16x must beat 1x (the 1x run is warm-up dominated;
    a hidden quadratic would show the opposite ordering)."""
    for op in ("hll_registers+estimate", "kmv_bottom_k"):
        per = {r["factor"]: r["rows_per_sec"] for r in _rows() if r["op"] == op}
        assert per[16] > per[1], (op, per)
