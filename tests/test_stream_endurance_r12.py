"""Per-key-state maintainer endurance record (VERDICT r11 #7): the
committed 128-micro-batch runs of the markov-carry and bitmap-word
maintenance loops (tools/probe_stream_endurance_r12.py →
tools/probe_results/stream_endurance_r12.jsonl) must keep showing the
shapes that make a KEYED-state foreachBatch maintainer stream-length
safe:

- live file counts bounded at every checkpoint (in-loop compaction for
  the delta log + seen set, the round-12 version GC for the carry);
- STATE SIZE flat: the carry holds one row per user and the bitmap
  holds one word row per (group, word-index) — both bounded by the key
  DOMAIN, never by stream length;
- the serving-read wall flat from the first checkpoint to the last;
- endurance does not drift correctness: after 128 batches (with
  redeliveries planted every 16th), each folded result equality-joins
  its from-scratch batch twin.
"""

from __future__ import annotations

import json
from pathlib import Path

PROBE = (
    Path(__file__).parent.parent
    / "tools"
    / "probe_results"
    / "stream_endurance_r12.jsonl"
)


def _records(maintainer: str):
    recs = [json.loads(line) for line in PROBE.read_text().splitlines() if line]
    mine = [r for r in recs if r.get("maintainer") == maintainer]
    checkpoints = [r for r in mine if not r.get("summary")]
    summary = [r for r in mine if r.get("summary")]
    assert len(summary) == 1, maintainer
    return checkpoints, summary[0]


def test_both_runs_are_long_and_checkpointed():
    for m in ("markov_carry", "bitmap_words"):
        checkpoints, summary = _records(m)
        assert summary["n_batches"] >= 64, m
        assert len(checkpoints) >= 4, m


def test_markov_state_and_files_stay_bounded():
    checkpoints, _ = _records("markov_carry")
    carry_rows = [r["carry_rows"] for r in checkpoints]
    for r in checkpoints:
        assert r["carry_versions_live"] <= 2, r  # the round-12 GC
        assert r["seen_files"] <= 3, r
        assert r["delta_files"] <= 3, r
    # per-user state: one row per user seen so far — bounded by the
    # user domain; the last half of the run must be FLAT (every user
    # has appeared), not growing with batches
    assert carry_rows[-1] == carry_rows[len(carry_rows) // 2], carry_rows


def test_bitmap_state_and_files_stay_bounded():
    checkpoints, _ = _records("bitmap_words")
    for r in checkpoints:
        assert r["delta_files"] <= 3, r
    words = [r["word_rows"] for r in checkpoints]
    # word state is bounded by |groups| x |custkey-domain|/64 — flat
    # once the domain is covered
    assert words[-1] <= 2 * words[0], words


def test_serve_walls_flat_across_stream_length():
    for m in ("markov_carry", "bitmap_words"):
        checkpoints, _ = _records(m)
        first, last = checkpoints[0]["serve_sec"], checkpoints[-1]["serve_sec"]
        assert last <= max(2.0 * first, 1.5), (m, first, last)


def test_endurance_does_not_drift_correctness():
    for m in ("markov_carry", "bitmap_words"):
        _, summary = _records(m)
        assert summary["endurance_correct"] is True, summary
