"""Property-based check of the A4 tombstone tracker (SURVEY.md §5.2
item 4): for arbitrary event sequences, the DataFrame formulation must
equal a direct Python replay of the reference's state machine
(consumers/models/line.py:31-54 — clear prev slot, then set arrive slot,
in event-time order with consumption-order tie-break)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.generator import ARRIVALS_SCHEMA
from public_transit_status_with_apache_kafka_spark.operators.cta_views import train_positions

STATIONS = [0, 1, 2]
DIRS = ["a", "b"]
TRAINS = ["BL001", "BL002"]

event = st.tuples(
    st.integers(0, 5),  # ts minute (small range to force ties)
    st.sampled_from(STATIONS),
    st.sampled_from(TRAINS),
    st.sampled_from(DIRS),
    st.none() | st.tuples(st.sampled_from(STATIONS), st.sampled_from(DIRS)),
)


def python_reference(events):
    """Replay in (ts, seq) order: within one event the depart clears the
    prev slot (whoever sits there) before the arrive sets the new slot."""
    slots: dict = {}
    for minute, sid, train, d, prev, seq in sorted(events, key=lambda e: (e[0], e[5])):
        if prev is not None:
            slots[prev] = (None, None)
        slots[(sid, d)] = (train, "in_service")
    return slots


@settings(max_examples=25, deadline=None)
@given(evs=st.lists(event, min_size=1, max_size=12))
def test_tracker_equals_python_replay(spark, evs):
    events = [e + (i,) for i, e in enumerate(evs)]  # seq = consumption order
    rows = [
        (
            datetime(2024, 1, 1, 0, minute),
            sid,
            train,
            d,
            "blue",
            "in_service",
            None if prev is None else prev[0],
            None if prev is None else prev[1],
            seq,
        )
        for (minute, sid, train, d, prev, seq) in events
    ]
    got = {
        (r.station_id, r.direction): (r.train_id, r.train_status)
        for r in train_positions(
            spark.createDataFrame(rows, ARRIVALS_SCHEMA)
        ).collect()
    }
    assert got == python_reference(events)
