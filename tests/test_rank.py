"""Distributed stratified rank (operators/rank.py): equivalence with
the window form, partition-layout invariance, and the skew scenario a
per-stratum window cannot distribute."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from public_transit_status_with_apache_kafka_spark.operators.rank import stratified_rank


def _window_ref(df, strata, order):
    w = Window.partitionBy(*strata).orderBy(*order)
    wc = Window.partitionBy(*strata)
    return df.select(
        "*",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(wc).alias("n_stratum"),
    )


def test_stratified_rank_equals_window_form(spark):
    random.seed(3)
    rows = [
        (i, random.choice(["en", "de", "fr"]), random.randint(0, 5))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "id long, lang string, score long")
    got = {tuple(r) for r in stratified_rank(df, ["lang"], ["score", "id"]).collect()}
    exp = {tuple(r) for r in _window_ref(df, ["lang"], ["score", "id"]).collect()}
    assert got == exp and len(got) == 5000


def test_stratified_rank_partitioning_invariant(spark):
    random.seed(5)
    rows = [(i, "x" if i % 7 else "y", random.randint(0, 3)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, s string, v long")
    a = sorted(map(tuple, stratified_rank(df, ["s"], ["v", "id"]).collect()))
    b = sorted(
        map(tuple, stratified_rank(df.repartition(7), ["s"], ["v", "id"]).collect())
    )
    c = sorted(
        map(
            tuple,
            stratified_rank(df, ["s"], ["v", "id"], num_partitions=5).collect(),
        )
    )
    assert a == b == c


def test_stratified_rank_distributes_one_giant_stratum(spark):
    """The reason this operator exists: ONE stratum holding ~all rows
    must still spread across many range partitions (a window would rank
    it in a single task). Assert the dominant stratum's rows span
    multiple physical partitions of the sorted layout AND ranks are the
    exact 1..n sequence."""
    n = 20_000
    df = spark.createDataFrame(
        [(i, "en" if i % 1000 else "de", i * 7 % n) for i in range(n)],
        "id long, lang string, score long",
    )
    ranked = stratified_rank(df, ["lang"], ["score", "id"], num_partitions=16)
    spread = (
        ranked.filter(F.col("lang") == "en")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spread >= 8, spread  # giant stratum spans many partitions
    en = ranked.filter(F.col("lang") == "en").select("rnk").collect()
    ranks = sorted(r.rnk for r in en)
    assert ranks == list(range(1, len(ranks) + 1))


def test_histogram_select_equals_ranked_selection(spark):
    """histogram_select must return exactly the value at the target
    rank in each sorted stratum (lower median, decile cuts), matching
    a window row_number reference, including heavy ties."""
    import random

    random.seed(11)
    rows = [
        (i, random.choice(["a", "b"]), random.choice([3, 3, 3, 7, 9, 12]))
        for i in range(999)
    ]
    df = spark.createDataFrame(rows, "id long, s string, v long")

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        histogram_select,
    )

    w = Window.partitionBy("s").orderBy("v", "id")
    wc = Window.partitionBy("s")
    ranked = df.select(
        "s", "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("m"),
    )
    for label, fn, ref_rn in [
        ("median", lambda m: (m + 1) / 2, lambda m: (m + 1) // 2),
        ("p90", lambda m: (9 * m + 9) / 10, lambda m: (9 * m + 9) // 10),
    ]:
        got = {
            r.s: r.sel
            for r in histogram_select(df, ["s"], "v", fn, out_col="sel").collect()
        }
        exp = {}
        for r in ranked.collect():
            if r.rn == ref_rn(r.m):
                exp[r.s] = r.v
        assert got == exp, (label, got, exp)


def test_stratified_cumsum_equals_window_form(spark):
    """Distributed prefix sum == sum() over the running window, exact
    int64, across partition boundaries and under a skewed stratum."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cumsum,
    )

    random.seed(23)
    # stratum 'hot' holds ~80% of rows: its prefix sum must still be
    # exact when the stratum spans most partitions
    rows = [
        (i, "hot" if random.random() < 0.8 else ["a", "b"][i % 2],
         random.randint(-50, 1000))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v long")

    got = {
        (r.k, r.id): r.cum
        for r in stratified_cumsum(df, ["k"], ["id"], "v", num_partitions=8).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r.k, r.id): r.cum
        for r in df.select("k", "id", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == exp


def test_stratified_cumsum_multi_column_equals_two_window_sums(spark):
    """Round 12: several prefix sums over one sorted layout — the fused
    (value_col list) form must equal the two independent window sums,
    including null semantics per column (one column can be pre-first-
    non-null while the other already carries), across partitions."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cumsum,
    )

    random.seed(41)
    rows = []
    for i in range(4000):
        k = ["a", "b", "hot"][i % 3] if random.random() > 0.6 else "hot"
        v1 = None if random.random() < 0.15 else random.randint(-40, 900)
        v2 = None if random.random() < 0.7 else random.randint(-5, 9)
        rows.append((i, k, v1, v2))
    df = spark.createDataFrame(rows, "id long, k string, v1 long, v2 long")

    got = {
        (r.k, r.id): (r.cum1, r.cum2)
        for r in stratified_cumsum(
            df, ["k"], ["id"], ["v1", "v2"], out_col=["cum1", "cum2"],
            num_partitions=8,
        ).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r.k, r.id): (r.cum1, r.cum2)
        for r in df.select(
            "k", "id",
            F.sum("v1").over(w).alias("cum1"),
            F.sum("v2").over(w).alias("cum2"),
        ).collect()
    }
    assert got == exp


def test_stratified_cumsum_null_semantics_match_window(spark):
    """Null values contribute nothing; rows before a stratum's first
    non-null get NULL (SQL sum over an all-null frame) — including the
    cross-partition case where a whole (partition, stratum) slice is
    null. Float value columns are refused, not truncated."""
    import pytest

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cumsum,
    )

    rows = []
    for i in range(3000):
        k = ["a", "b", "lead_null"][i % 3]
        # 'lead_null': null until near the end -> spans many partitions
        # with zero non-null rows, exercising the all-null carry groups
        if k == "lead_null":
            v = 7 if i >= 2900 else None
        else:
            v = (i * 13) % 97 if i % 5 else None
        rows.append((i, k, v))
    df = spark.createDataFrame(rows, "id long, k string, v long")

    got = {
        (r.k, r.id): r.cum
        for r in stratified_cumsum(df, ["k"], ["id"], "v", num_partitions=8).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r.k, r.id): r.cum
        for r in df.select("k", "id", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == exp
    assert got[("lead_null", 2)] is None  # leading nulls stay NULL

    with pytest.raises(TypeError, match="integral value column"):
        stratified_cumsum(
            df.withColumn("v", F.col("v").cast("double")), ["k"], ["id"], "v"
        )


def test_stratified_locf_nan_treated_as_missing_in_both_passes(spark):
    """A genuine NaN observation is treated as missing (Arrow conflates
    NaN with SQL null kernel-side) — crucially, pass 1 must agree, or a
    partition whose LAST observation is NaN would seed the next
    partition differently from how the kernel fills its own rows."""
    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_locf,
    )

    rows = [(0, "a", 3.5)] + [
        (i, "a", float("nan") if i == 1 else None) for i in range(1, 400)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = {
        r.id: r.filled
        for r in stratified_locf(df, ["k"], ["id"], "v", num_partitions=8).collect()
    }
    # every row after id=0 carries 3.5 — the NaN at id=1 was skipped by
    # pass 1's seed election AND by the kernel's in-partition fill
    assert got[0] == 3.5 and got[399] == 3.5
    assert all(v == 3.5 for v in got.values())


def test_rank_family_under_tiny_arrow_batches(spark):
    """Adversarial Arrow batching: maxRecordsPerBatch=37 forces every
    kernel through dozens of batch boundaries per partition — the
    cross-batch carry paths (cumsum running dict, locf running fill,
    lead's pend row, rank's seen counts) must all hold. Each operator
    is compared against its window form on the same skewed frame."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cumsum,
        stratified_lead,
        stratified_locf,
        stratified_rank,
    )

    random.seed(53)
    rows = [
        (
            i,
            "hot" if random.random() < 0.7 else ["a", "b"][i % 2],
            random.randint(-100, 100) if i % 6 else None,
            float(i % 13) if i % 5 else None,
        )
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, k string, iv long, dv double")
    w = Window.partitionBy("k").orderBy("id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        got_rank = {
            r.id: r.rnk
            for r in stratified_rank(df, ["k"], ["id"], num_partitions=6).collect()
        }
        got_cum = {
            r.id: r.cum
            for r in stratified_cumsum(
                df, ["k"], ["id"], "iv", num_partitions=6
            ).collect()
        }
        got_fill = {
            r.id: r.filled
            for r in stratified_locf(
                df, ["k"], ["id"], "dv", num_partitions=6
            ).collect()
        }
        got_lead = {
            r.id: r.dv_next
            for r in stratified_lead(
                df, ["k"], ["id"], ["dv"], num_partitions=6
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    exp = df.select(
        "id",
        F.row_number().over(w).alias("rnk"),
        F.sum("iv").over(w_run).alias("cum"),
        F.last("dv", ignorenulls=True).over(w_run).alias("filled"),
        F.lead("dv").over(w).alias("dv_next"),
    ).collect()
    assert got_rank == {r.id: r.rnk for r in exp}
    assert got_cum == {r.id: r.cum for r in exp}
    assert got_fill == {r.id: r.filled for r in exp}
    assert got_lead == {r.id: r.dv_next for r in exp}


def test_rank_family_timestamp_strata_keys(spark):
    """Timestamp-typed STRATUM columns: the vectorized run detection
    must produce keys that match the broadcast dicts built from
    collected datetime values (raw np.datetime64 hashes/compares equal
    to nothing there — pd.Timestamp does). Regression for the _runs
    key-type bug: rank would KeyError, locf would silently drop
    cross-partition carries via seeds.get -> None."""
    import datetime

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_locf,
        stratified_rank,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(days=i % 3),
         float(i) if i % 4 else None)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, day timestamp, v double")

    ranked = {
        r.id: r.rnk
        for r in stratified_rank(df, ["day"], ["id"], num_partitions=8).collect()
    }
    w = Window.partitionBy("day").orderBy("id")
    exp = {
        r.id: r.rnk
        for r in df.select("id", F.row_number().over(w).alias("rnk")).collect()
    }
    assert ranked == exp

    filled = {
        r.id: r.filled
        for r in stratified_locf(
            df, ["day"], ["id"], "v", num_partitions=8
        ).collect()
    }
    wf = (
        Window.partitionBy("day")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expf = {
        r.id: r.filled
        for r in df.select(
            "id", F.last("v", ignorenulls=True).over(wf).alias("filled")
        ).collect()
    }
    assert filled == expf


def test_stratified_rank_global_no_strata(spark):
    """Empty strata = one global stratum spread across the range
    partitions: ranks equal row_number() over a global ORDER BY — the
    distributed answer to the single-partition global sort."""
    rows = [(i, float((i * 37) % 101)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r.id: r.rnk
        for r in stratified_rank(df, [], ["v", "id"], num_partitions=8).collect()
    }
    w = Window.orderBy("v", "id")
    exp = {
        r.id: r.rnk
        for r in df.select("id", F.row_number().over(w).alias("rnk")).collect()
    }
    assert got == exp


def test_stratified_lead_equals_window_form(spark):
    """Distributed lead(1) == lead() over the per-stratum window —
    including stratum boundaries inside a partition, partition
    boundaries inside a stratum, Arrow batch boundaries (maxRecords
    10000 < rows), and NULL leads on each stratum's last row."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_lead,
    )

    random.seed(31)
    rows = [
        (i, ["a", "b", "c"][i % 3], random.randint(-1000, 1000), float(i % 7))
        for i in range(25000)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v long, w double")

    got = {
        r.id: (r.v_next, r.w_next)
        for r in stratified_lead(
            df, ["k"], ["id"], ["v", "w"], num_partitions=8
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("id")
    exp = {
        r.id: (r.v_next, r.w_next)
        for r in df.select(
            "id",
            F.lead("v").over(w).alias("v_next"),
            F.lead("w").over(w).alias("w_next"),
        ).collect()
    }
    assert got == exp
    # the three stratum-final rows really have NULL leads
    assert sum(1 for v, _ in got.values() if v is None) == 3


def test_stratified_locf_equals_window_form(spark):
    """Distributed LOCF == last(ignorenulls) over the running window,
    including: leading nulls stay null, a long all-null stretch that
    spans partitions carries the older observation through, and values
    pass through verbatim (no float drift)."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_locf,
    )

    random.seed(17)
    rows = []
    for i in range(4000):
        key = ["a", "b", "c"][i % 3]
        # stratum 'c': one early observation then nulls forever (the
        # cross-partition carry case); others: sparse observations
        if key == "c":
            v = 1.25 if i == 2 else None
        else:
            v = round(random.random() * 10, 2) if random.random() < 0.1 else None
        rows.append((i, key, v))
    df = spark.createDataFrame(rows, "id long, k string, v double")

    got = {
        r.id: r.filled
        for r in stratified_locf(df, ["k"], ["id"], "v", num_partitions=8).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        r.id: r.filled
        for r in df.select(
            "id", F.last("v", ignorenulls=True).over(w).alias("filled")
        ).collect()
    }
    assert got == exp
    # the 'c' stratum's single observation reached the last row
    assert got[max(i for i in got if i % 3 == 2)] == 1.25
    # nulls really are SQL nulls, not NaN
    assert all(v is None or v == v for v in got.values())


def test_stratified_cummin_equals_window_form(spark):
    """Distributed running min == min() over the running window,
    including null carry across partitions and the float refusal."""
    import random

    import pytest

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cummin,
    )

    random.seed(31)
    rows = []
    for i in range(4000):
        k = ["hot", "a", "lead_null"][0 if random.random() < 0.7 else (i % 2) + 1]
        if k == "lead_null":
            v = -3 if i >= 3900 else None
        else:
            v = random.randint(-1000, 1000) if i % 7 else None
        rows.append((i, k, v))
    df = spark.createDataFrame(rows, "id long, k string, v long")

    got = {
        (r.k, r.id): r.cum_min
        for r in stratified_cummin(df, ["k"], ["id"], "v", num_partitions=8).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r.k, r.id): r.cum_min
        for r in df.select("k", "id", F.min("v").over(w).alias("cum_min")).collect()
    }
    assert got == exp

    with pytest.raises(TypeError, match="integral value column"):
        stratified_cummin(
            df.withColumn("v", F.col("v").cast("double")), ["k"], ["id"], "v"
        )


def test_stratified_cummin_exclusive_equals_window_form(spark):
    """excl_col == min() over rowsBetween(unboundedPreceding, -1),
    including NULL on each stratum's opening rows and across partition
    boundaries."""
    import random

    from public_transit_status_with_apache_kafka_spark.operators.rank import (
        stratified_cummin,
    )

    random.seed(47)
    rows = [
        (i, ["a", "b"][i % 2], random.randint(-100, 100) if i % 6 else None)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v long")
    got = {
        (r.k, r.id): (r.cum_min, r.prev_min)
        for r in stratified_cummin(
            df, ["k"], ["id"], "v", excl_col="prev_min", num_partitions=8
        ).collect()
    }
    wi = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    we = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    exp = {
        (r.k, r.id): (r.cum_min, r.prev_min)
        for r in df.select(
            "k",
            "id",
            F.min("v").over(wi).alias("cum_min"),
            F.min("v").over(we).alias("prev_min"),
        ).collect()
    }
    assert got == exp
