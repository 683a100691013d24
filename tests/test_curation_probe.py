"""Pin the recorded curation-capstone scale probe
(tools/probe_curation.py → tools/probe_results/curation_r09.jsonl):
replicating the corpus 16x with identical text must CONVERGE to the
same curated pool (the dedup stages absorb the duplication), and
throughput must rise with scale (no hidden quadratic in the chain)."""

from __future__ import annotations

import json
from pathlib import Path

RESULTS = (
    Path(__file__).parent.parent / "tools" / "probe_results" / "curation_r09.jsonl"
)


def _rows():
    return [json.loads(ln) for ln in RESULTS.read_text().splitlines() if ln.strip()]


def test_probe_recorded_for_all_factors():
    assert {r["factor"] for r in _rows()} == {1, 4, 16}


def test_replication_converges_to_the_same_curated_pool():
    rows = {r["factor"]: r for r in _rows()}
    base = rows[1]
    for f in (4, 16):
        assert rows[f]["rows_in"] == f * base["rows_in"]
        # every replica is an exact/near duplicate: the kept set must
        # be IDENTICAL at every factor, not merely similar-sized
        for col in ("after_url_dedup", "after_neardup", "final_kept"):
            assert rows[f][col] == base[col], (f, col, rows[f], base)


def test_throughput_rises_with_scale():
    per = {r["factor"]: r["rows_per_sec"] for r in _rows()}
    assert per[16] > per[4] > per[1], per
