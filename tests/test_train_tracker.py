"""A4 tombstone-latest scripted sequences (SURVEY.md §5.2 item 3):
arrive -> depart -> re-arrive, null prev_* (F5), out-of-order timestamps,
same-timestamp arrive/depart tie-break (depart processed before arrive
within one message, consumers/models/line.py:31-54)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from public_transit_status_with_apache_kafka_spark.generator import ARRIVALS_SCHEMA
from public_transit_status_with_apache_kafka_spark.operators.cta_views import train_positions


def _arrivals(spark, rows):
    """rows: (ts_minute, station_id, train_id, direction, prev_station_id,
    prev_direction, seq)"""
    data = [
        (
            datetime(2024, 1, 1, 0, m),
            sid,
            tid,
            d,
            "blue",
            "in_service",
            psid,
            pd_,
            seq,
        )
        for (m, sid, tid, d, psid, pd_, seq) in rows
    ]
    return spark.createDataFrame(data, ARRIVALS_SCHEMA)


def _positions(spark, rows):
    out = train_positions(_arrivals(spark, rows)).collect()
    return {(r.station_id, r.direction): r.train_id for r in out}


def test_initial_placement_null_prev(spark):
    """F5: null prev_* emits no depart effect."""
    pos = _positions(spark, [(0, 1, "BL001", "a", None, None, 0)])
    assert pos == {(1, "a"): "BL001"}


def test_move_leaves_tombstone(spark):
    """Arrive at 2 clears the slot at 1 (depart wins at station 1)."""
    pos = _positions(
        spark,
        [(0, 1, "BL001", "a", None, None, 0), (5, 2, "BL001", "a", 1, "a", 1)],
    )
    assert pos[(2, "a")] == "BL001"
    assert pos[(1, "a")] is None  # tombstoned, renders '---'


def test_rearrival_after_departure(spark):
    """1 -> 2 -> back to 1: slot 1 re-occupied, slot 2 tombstoned."""
    pos = _positions(
        spark,
        [
            (0, 1, "BL001", "a", None, None, 0),
            (5, 2, "BL001", "a", 1, "a", 1),
            (10, 1, "BL001", "b", 2, "a", 2),
        ],
    )
    assert pos[(1, "b")] == "BL001"
    assert pos[(2, "a")] is None


def test_same_ts_swap_replays_in_message_order(spark):
    """Two trains swap stations in the same tick. The reference replays
    messages in consumption order and a depart clears the slot regardless
    of which train sits there (consumers/models/line.py:34-45): message
    seq=2 puts BL001 at 2, then message seq=3 departs slot 2 (clearing
    BL001!) and arrives BL002 at 1. Within ONE message the depart is
    applied before the arrive, so a self-referencing move keeps the
    arrive (kind tie-break) — across messages, later seq wins."""
    pos = _positions(
        spark,
        [
            (0, 1, "BL001", "a", None, None, 0),
            (0, 2, "BL002", "a", None, None, 1),
            (5, 2, "BL001", "a", 1, "a", 2),
            (5, 1, "BL002", "a", 2, "a", 3),
        ],
    )
    assert pos[(1, "a")] == "BL002"
    assert pos[(2, "a")] is None  # cleared by BL002's later depart


def test_same_message_self_move_keeps_arrive(spark):
    """A train departing and arriving at the SAME slot in one message
    (loop track): the in-message depart-then-arrive order means the
    arrive wins — kind is the last tie-break key."""
    pos = _positions(
        spark,
        [
            (0, 1, "BL001", "a", None, None, 0),
            (5, 1, "BL001", "a", 1, "a", 1),
        ],
    )
    assert pos[(1, "a")] == "BL001"


def test_out_of_order_timestamps(spark):
    """A late-arriving older event must not overwrite newer state."""
    pos = _positions(
        spark,
        [
            (10, 2, "BL001", "a", 1, "a", 5),  # newest state: at 2
            (0, 1, "BL001", "a", None, None, 0),  # late replayed older event
        ],
    )
    assert pos[(2, "a")] == "BL001"
    assert pos[(1, "a")] is None


def test_overwrite_without_departure(spark):
    """New arrival overwrites an occupied slot silently (reference
    semantics: dict assignment, consumers/models/line.py:47-54)."""
    pos = _positions(
        spark,
        [
            (0, 1, "BL001", "a", None, None, 0),
            (5, 1, "BL002", "a", None, None, 1),
        ],
    )
    assert pos[(1, "a")] == "BL002"
