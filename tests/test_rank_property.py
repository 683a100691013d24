"""Property test: the rank-family distributed carry operators
(stratified_rank / stratified_cumsum / stratified_locf /
stratified_lead) are exactly the per-stratum window forms on
randomized inputs — null values, duplicate order keys (disambiguated
by a unique id, as the operators require), skewed strata, and strata
that span many range partitions.

This is the randomized companion to tests/test_rank.py's hand-built
pins: both run the SAME Spark window as the expectation, so the test
isolates the two-pass carry machinery (range partitioning, pass-1
offset collection, pass-2 kernels) rather than engine semantics.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from public_transit_status_with_apache_kafka_spark.operators.rank import (
    stratified_cumsum,
    stratified_lead,
    stratified_locf,
    stratified_rank,
)

# skewed stratum alphabet: 'a' dominates, so one stratum spans several
# of the 5 range partitions while 'c' may be empty or tiny
STRATA = st.sampled_from(["a", "a", "a", "b", "c"])

rows = st.lists(
    st.tuples(
        STRATA,
        st.integers(min_value=0, max_value=9),            # order key (dups)
        st.one_of(st.none(), st.integers(-1000, 1000)),   # int value
        st.one_of(st.none(), st.sampled_from([-1.5, 0.0, 2.25, 7.5])),
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(data=rows)
def test_rank_family_equals_window_forms(spark, data):
    df = spark.createDataFrame(
        [(i, s, o, vi, vf, tag) for i, (s, o, vi, vf, tag) in enumerate(data)],
        "id long, s string, o long, vi long, vf double, tag string",
    )
    w = Window.partitionBy("s").orderBy("o", "id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    exp = df.select(
        "id",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy("s")).alias("n_stratum"),
        F.sum("vi").over(run).alias("cum"),
        F.last("vf", ignorenulls=True).over(run).alias("filled"),
        F.lead("tag").over(w).alias("tag_next"),
    )
    e = {r.id: (r.rnk, r.n_stratum, r.cum, r.filled, r.tag_next) for r in exp.collect()}

    kw = dict(num_partitions=5)
    g_rank = {
        r.id: (r.rnk, r.n_stratum)
        for r in stratified_rank(df, ["s"], ["o", "id"], **kw).collect()
    }
    g_cum = {
        r.id: r.cum
        for r in stratified_cumsum(df, ["s"], ["o", "id"], "vi", **kw).collect()
    }
    g_locf = {
        r.id: r.filled
        for r in stratified_locf(df, ["s"], ["o", "id"], "vf", **kw).collect()
    }
    g_lead = {
        r.id: r.tag_next
        for r in stratified_lead(df, ["s"], ["o", "id"], ["tag"], **kw).collect()
    }
    for i, (rnk, n, cum, filled, tag_next) in e.items():
        assert g_rank[i] == (rnk, n)
        assert g_cum[i] == cum
        assert g_locf[i] == filled
        assert g_lead[i] == tag_next
