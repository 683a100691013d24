"""Lakehouse family scale-probe record (VERDICT r9 #6): the committed
1x/4x/16x replication runs (tools/probe_lakehouse.py →
tools/probe_results/lakehouse_r10.jsonl) must keep showing the shapes
that make these read paths 100 TB-safe:

- manifest pruning: the FIXED range predicate opens the same ~O(range)
  file count while total files grow 16x — the manifest is the scan
  plan, so scan cost tracks the query, not the corpus;
- bloom skipping: files read stay ~|keys| (+ a sub-file expected
  false-positive tail) while total files grow 16x;
- MVCC fold / positional-delete read: throughput at 16x is >= 1x
  (fixed scheduling overhead amortizes; a recorded slowdown means a
  hidden quadratic crept in and the probe needs re-running);
- delta-log compaction: folded rows value-match pre/post at every
  factor, the log folds to one generation, and the post-compaction
  serve never costs more than the pre-compaction fold.
"""

from __future__ import annotations

import json
from pathlib import Path

PROBE = (
    Path(__file__).parent.parent
    / "tools"
    / "probe_results"
    / "lakehouse_r10.jsonl"
)


def _by_op():
    recs = [json.loads(line) for line in PROBE.read_text().splitlines() if line]
    by_op: dict[str, dict[int, dict]] = {}
    for r in recs:
        by_op.setdefault(r["op"], {})[r["factor"]] = r
    return by_op


def test_probe_record_covers_family_at_all_factors():
    by_op = _by_op()
    assert set(by_op) == {
        "x_mvcc_time_travel",
        "x_positional_deletes",
        "x_manifest_pruning",
        "x_bloom_file_skip",
        "e8_index_compaction",
    }
    for op, facs in by_op.items():
        assert {1, 4, 16} <= set(facs), op


def test_manifest_pruning_opens_constant_files():
    facs = _by_op()["x_manifest_pruning"]
    base_kept = facs[1]["files_kept"]
    for f in (1, 4, 16):
        r = facs[f]
        assert r["files_total"] == 8 * f, r
        assert r["files_kept"] <= base_kept + 1, r
        assert r["n_matched"] == facs[1]["n_matched"], r


def test_bloom_skip_files_read_stay_near_key_count():
    facs = _by_op()["x_bloom_file_skip"]
    for f in (1, 4, 16):
        r = facs[f]
        assert r["files_total"] == 8 * f, r
        # 3 keys; allow the sizing's expected sub-file FP tail
        assert r["files_read"] <= 6, r
        assert r["n_matched"] == facs[1]["n_matched"], r


def test_fold_and_read_throughput_amortize_at_16x():
    by_op = _by_op()
    mv = by_op["x_mvcc_time_travel"]
    assert mv[16]["delta_rows_per_sec"] >= mv[1]["delta_rows_per_sec"]
    assert mv[16]["n_delta_rows_scanned"] == 16 * mv[1]["n_delta_rows_scanned"]
    pd_ = by_op["x_positional_deletes"]
    assert pd_[16]["base_rows_per_sec"] >= pd_[1]["base_rows_per_sec"]
    assert pd_[16]["n_files"] == 16 * pd_[1]["n_files"]


def test_compaction_is_value_identical_and_bounds_serve_cost():
    facs = _by_op()["e8_index_compaction"]
    for f in (1, 4, 16):
        r = facs[f]
        assert r["rows_match"] is True, r
        assert r["files_before"] == 8 * f, r
        assert r["files_after"] <= 2, r
        assert r["serve_after_sec"] <= r["serve_before_sec"], r
    assert facs[16]["fold_rows_per_sec"] >= facs[1]["fold_rows_per_sec"]
