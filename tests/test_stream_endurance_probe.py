"""Streaming-maintainer endurance record (VERDICT r10 #4): the
committed 128-micro-batch run of the e8_stream_index_update
maintenance loop (tools/probe_stream_endurance.py →
tools/probe_results/stream_endurance_r11.jsonl) must keep showing the
shapes that make a foreachBatch LSM maintainer stream-length-safe:

- the in-loop compaction BOUNDS the live delta-log and seen-set file
  counts at every checkpoint (the log never grows with stream length);
- the serving-read wall stays flat from the first checkpoint to the
  last (a growing serve wall means the fold is paying for dead
  generations);
- idempotence holds across the whole run (planted redeliveries every
  16th delivery): seen docs == delivered docs, and the folded index
  equality-joins the from-scratch batch twin term-for-term.
"""

from __future__ import annotations

import json
from pathlib import Path

PROBE = (
    Path(__file__).parent.parent
    / "tools"
    / "probe_results"
    / "stream_endurance_r11.jsonl"
)


def _records():
    recs = [json.loads(line) for line in PROBE.read_text().splitlines() if line]
    checkpoints = [r for r in recs if not r.get("summary")]
    summary = [r for r in recs if r.get("summary")]
    assert len(summary) == 1
    return checkpoints, summary[0]


def test_endurance_run_is_long_and_checkpointed():
    checkpoints, summary = _records()
    assert summary["n_batches"] >= 64
    assert len(checkpoints) == summary["n_checkpoints"] >= 4
    assert checkpoints[-1]["checkpoint_batch"] == summary["n_batches"]


def test_delta_log_stays_bounded_all_run():
    checkpoints, _ = _records()
    for r in checkpoints:
        # compaction threshold is 2 live generations; a checkpoint can
        # land right after an append (3) but never on unbounded growth
        assert r["delta_files"] <= 3, r
        assert r["seen_files"] <= 3, r


def test_serve_wall_flat_across_stream_length():
    checkpoints, _ = _records()
    first, last = checkpoints[0]["serve_sec"], checkpoints[-1]["serve_sec"]
    # the first checkpoint's serve pays job warm-up; the last must not
    # exceed it meaningfully (a monotone-growing serve wall is the
    # failure mode this probe exists to catch)
    assert last <= max(2.0 * first, 1.5), (first, last)


def test_endurance_does_not_drift_correctness():
    _, summary = _records()
    assert summary["n_terms_agree"] == summary["n_terms_twin"] > 0
    assert summary["n_seen_docs"] == summary["n_delivered_docs"]
