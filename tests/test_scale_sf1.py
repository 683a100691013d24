"""Whole-registry sf1.0 scale-gate record (VERDICT r10 #1): the
committed artifacts of the uniform 10x data step must keep showing:

- the FULL 300-query registry ran at sf1.0 with zero errors
  (`BENCH_FULL_sf1_r11.json`);
- every superlinear riser in `SCALE_SF1.md` carries a diagnosis (no
  TBD rows survive);
- the row-count sanity laws all hold
  (`tools/probe_results/rowcount_sf1_r11.jsonl`): fixed-cardinality
  outputs stay flat, per-entity outputs scale exactly 10x, and the
  one probabilistic family stays within its tolerance band.
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).parent.parent


def test_sf1_sweep_covers_registry_with_zero_errors():
    rec = json.loads((ROOT / "BENCH_FULL_sf1_r11.json").read_text())
    import __spark_entry__ as entry

    assert rec["n"] == len(entry.queries())
    assert rec["n_errors"] == 0
    timed = [v for v in rec["queries"].values() if isinstance(v, float)]
    assert len(timed) == rec["n"]


def test_scale_report_has_no_undiagnosed_risers():
    text = (ROOT / "SCALE_SF1.md").read_text()
    assert "| TBD |" not in text
    assert "## Errors at sf1.0" not in text
    # the one known riser is present AND diagnosed
    assert "x_fuzzy_name_match" in text
    assert "PAIR-COUNT-DRIVEN" in text


def test_rowcount_laws_all_hold():
    path = ROOT / "tools" / "probe_results" / "rowcount_sf1_r11.jsonl"
    recs = [json.loads(line) for line in path.read_text().splitlines() if line]
    assert len(recs) >= 10
    assert all(r["ok"] for r in recs), [r["query"] for r in recs if not r["ok"]]
    modes = {r["mode"] for r in recs}
    assert modes == {"exact", "approx"}
    # the flat laws really are flat and the x10 laws really are x10
    for r in recs:
        if r["mode"] == "exact" and r["expected_mult"] == 1:
            assert r["rows_big"] == r["rows_small"], r
        if r["mode"] == "exact" and r["expected_mult"] == 10:
            assert r["rows_big"] == 10 * r["rows_small"], r
