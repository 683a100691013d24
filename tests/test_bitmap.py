"""Property tests: bitmap-word distinct counts and pairwise set algebra
(operators/bitmap.py) match pure-python set arithmetic on randomized
(group, id) multisets — duplicate ids, shared ids across groups, ids
spanning word boundaries (0..200 over 32-bit words → 7 words), and
groups with disjoint audiences all appear at this size."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.operators import bitmap

rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 200)),
    min_size=1,
    max_size=60,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, i) for g, i in rows], "g string, id long"
    )


@settings(max_examples=10, deadline=None)
@given(rows=rows_strategy)
def test_distinct_counts_match_sets(spark, rows):
    words = bitmap.bitmap_words(_df(spark, rows), ["g"], "id")
    got = {
        r["g"]: (r["n_distinct"], r["n_rows"])
        for r in bitmap.distinct_counts(words, ["g"]).collect()
    }
    expected = {
        g: (
            len({i for gg, i in rows if gg == g}),
            sum(1 for gg, _ in rows if gg == g),
        )
        for g in {g for g, _ in rows}
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(rows=rows_strategy)
def test_pairwise_overlap_matches_sets(spark, rows):
    words = bitmap.bitmap_words(_df(spark, rows), ["g"], "id")
    got = {
        (r["g_a"], r["g_b"]): (r["n_inter"], r["n_union"], r["jaccard"])
        for r in bitmap.pairwise_overlap(words, "g").collect()
    }
    sets = {g: {i for gg, i in rows if gg == g} for g in {g for g, _ in rows}}
    expected = {}
    for ga in sets:
        for gb in sets:
            if ga < gb and sets[ga] & sets[gb]:
                inter = len(sets[ga] & sets[gb])
                union = len(sets[ga] | sets[gb])
                # same half-up integer rounding as ratio_round
                jac = ((inter * 20000 + union) // (2 * union)) / 10000.0
                expected[(ga, gb)] = (inter, union, jac)
    assert got == expected


def test_word_boundary_ids_exact(spark):
    """Ids straddling word boundaries (31/32, 63/64) and the same id
    delivered many times land in exactly one bit each."""
    rows = [("a", i) for i in (0, 31, 32, 33, 63, 64, 64, 64, 200)]
    words = bitmap.bitmap_words(_df(spark, rows), ["g"], "id")
    out = bitmap.distinct_counts(words, ["g"]).collect()[0]
    assert (out["n_distinct"], out["n_rows"]) == (7, 9)
