"""Property test: the three as-of formulations (join+max_by,
union+window, range-partitioned struct carry) all agree with a
bisect-based Python reference model on randomized inputs — including
NULL timestamps on either side, at-timestamp equality, keys missing
from one side, and empty sides.

Reference semantics (asof_join / DuckDB ASOF JOIN): for each left row,
the right row with the greatest right_ts <= left_ts within the key;
NULL timestamps never match (`>=` is UNKNOWN); left rows without a
match keep NULL value columns.
"""

from __future__ import annotations

import bisect

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.operators.asof import (
    asof_join,
    asof_join_union,
    stratified_asof,
)

KEYS = ["a", "b", "c"]

ts_or_null = st.one_of(st.none(), st.integers(min_value=0, max_value=99))

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), ts_or_null),
    min_size=0,
    max_size=30,
)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS + ["only_right"]), ts_or_null),
    min_size=0,
    max_size=30,
)


def _model(left, right):
    """dict: left row index -> matched val (or None)."""
    by_key: dict[str, list[int]] = {}
    for k, rts in right:
        if rts is not None:
            by_key.setdefault(k, []).append(rts)
    for v in by_key.values():
        v.sort()
    out = {}
    for i, (k, ts) in enumerate(left):
        val = None
        if ts is not None and k in by_key:
            pos = bisect.bisect_right(by_key[k], ts)
            if pos:
                val = f"v{by_key[k][pos - 1]}"
        out[i] = val
    return out


@settings(max_examples=12, deadline=None)
@given(left=left_rows, right=right_rows)
def test_asof_forms_match_reference_model(spark, left, right):
    # stratified_asof requires unique (key, right_ts); the model and the
    # other forms would be ambiguous under ties anyway, so dedupe here
    right = sorted({(k, t) for k, t in right}, key=lambda kt: (kt[0], kt[1] is not None, kt[1] or 0))
    expected = _model(left, right)

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "lid long, k string, ts long",
    )
    if not left:
        ldf = ldf.filter("lid IS NOT NULL")
    rdf = spark.createDataFrame(
        [(k, t, None if t is None else f"v{t}") for k, t in right]
        or [(None, None, None)],
        "rk string, rts long, val string",
    )
    if not right:
        rdf = rdf.filter("rk IS NOT NULL")

    kw = dict(
        left_on="k", right_on="rk", left_ts="ts", right_ts="rts",
        value_cols=["val"],
    )
    a = {r.lid: r.val for r in asof_join(ldf, rdf, **kw).collect()}
    b = {r.lid: r.val for r in asof_join_union(ldf, rdf, **kw).collect()}
    c = {
        r.lid: r.val
        for r in stratified_asof(
            ldf, rdf, "k", "rk", "ts", "rts", ["val"], num_partitions=4
        ).collect()
    }
    assert a == expected
    assert b == expected
    assert c == expected
