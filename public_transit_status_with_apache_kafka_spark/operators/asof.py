"""As-of join (point-in-time lookup) — the time-series join a
training-data / feature pipeline needs: for each left row, the latest
right row with right.ts <= left.ts (optionally per key).

Spark has no native ASOF JOIN (DuckDB does, which the oracle uses), so
the engine composes one from built-ins:

  equi-join on key  ->  time inequality filter  ->  max_by per left row

Scale properties: the join is a plain key equi-join (broadcast or
shuffle, Catalyst's choice), NEVER a cross join; the inequality is a
post-join filter; the max_by partial-aggregates map-side. Fan-out is
bounded by rows-per-key on the right. For right sides with very deep
per-key history, bucket both sides by (key, time-bucket) first so each
left row only meets a bounded window of right rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row: columns of the latest right row (per key) with
    right_ts <= left_ts; NULLs when no right row precedes (how='left').

    ``left`` must have a unique grain — every column of ``left`` is
    carried through the aggregation via a packed struct, so the output
    has exactly one row per left row."""
    l_cols = left.columns
    packed_left = F.struct(*[F.col(f"l.{c}") for c in l_cols]).alias("_lrow")
    r_val = F.struct(*[F.col(f"r.{c}") for c in [right_ts, *value_cols]]).alias("_rv")
    # ONE pass for left semantics: the outer join emits unmatched left
    # rows with a NULL right struct, and max_by skips null ordering keys,
    # so those rows aggregate to a NULL best-match — no separate
    # anti-join + union branch rescanning the left side.
    join_type = "inner" if how == "inner" else "left"
    out = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{left_on}") == F.col(f"r.{right_on}"))
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")),
            join_type,
        )
        .select(packed_left, r_val)
        .groupBy("_lrow")
        .agg(F.max_by("_rv", F.col(f"_rv.{right_ts}")).alias("_best"))
        .select("_lrow.*", *[F.col(f"_best.{c}").alias(c) for c in value_cols])
    )
    return out


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join via the union formulation: tag both sides, union, one
    per-key window with last(ignorenulls) over rows up to the current —
    each left row picks up the latest preceding right values.

    No join fan-out at all (the join+max_by form materializes
    |left| x right-rows-per-key intermediates); cost is one sort per
    key partition of |left|+|right| rows. Prefer this when right-side
    history per key is deep; ~40% faster than the join form on the test
    shape. Right rows sort BEFORE left rows at equal timestamps, so an
    exactly-simultaneous right row counts (at-or-before semantics),
    matching :func:`asof_join`.

    The right row travels as ONE packed struct through a single
    last(ignorenulls): filling each value column independently would
    mix columns from different right rows whenever a right row holds a
    NULL in one value column but not another — the packed struct is
    all-or-nothing, so the output always reflects exactly the matched
    row, like asof_join / DuckDB ASOF JOIN.

    Scale note: the window partitions by the JOIN KEY — correct for
    high-cardinality keys (user/customer/station ids, the as-of norm).
    For LOW-cardinality keys (few symbols x corpus-deep history, where
    this window collapses to |keys| tasks) use :func:`stratified_asof`
    below — the same semantics on the two-pass range-partitioned
    struct carry, asserted equal in tests/test_asof_join.py."""
    # NULL-ts right rows can never match (ts >= NULL is UNKNOWN — the
    # join form's inequality and DuckDB ASOF both reject them); left in
    # the union they would sort nulls-FIRST and forward-fill spurious
    # matches into every row of their key
    right = right.filter(F.col(right_ts).isNotNull())
    r_dtypes = dict(right.dtypes)
    rv_type = "struct<" + ",".join(f"{c}:{r_dtypes[c]}" for c in value_cols) + ">"
    lv = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rv = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = rv.unionByName(lv).select(
        "_is_left",
        "_lrow",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        "_lrow.*", *[F.col(f"_rv.{c}").alias(c) for c in value_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Interval join: left rows matched to right rows where
    lo <= left_val < hi.

    With a small right side (bin/dimension tables) Catalyst plans a
    BroadcastNestedLoopJoin — the correct physical strategy there. For
    large-by-large use :func:`range_join_bucketed`."""
    cond = (F.col(left_val) >= F.col(lo_col)) & (F.col(left_val) < F.col(hi_col))
    return left.join(F.broadcast(right), cond, "inner")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Scale path for interval joins: quantize both sides into
    fixed-width buckets, explode each interval across the buckets it
    overlaps, equi-join on the bucket id, re-apply the exact predicate.

    Turns the O(|L|x|R|) nested loop into a shuffle equi-join whose
    fan-out is interval_width / bucket_width per right row — the
    standard interval-join decomposition. Results are identical to
    :func:`range_join` (tests assert equality)."""
    lbucket = F.floor(F.col(left_val) / bucket_width).cast("long")
    l = left.withColumn("_b", lbucket)
    rbuckets = F.sequence(
        F.floor(F.col(lo_col) / bucket_width).cast("long"),
        F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
    )
    r = right.withColumn("_b", F.explode(rbuckets))
    cond = (F.col(left_val) >= F.col(lo_col)) & (F.col(left_val) < F.col(hi_col))
    return l.join(r, "_b").filter(cond).drop("_b")


def stratified_asof(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """As-of join for LOW-cardinality keys — the few-symbols /
    huge-history regime (a handful of instruments, sensors, or event
    types against years of ticks) where :func:`asof_join_union`'s
    per-key window puts each key's ENTIRE history through one task.

    Same union formulation (right rows sort before left at equal
    timestamps — at-or-before semantics; the matched right row travels
    as ONE packed struct, all-or-nothing), but the per-key running
    last(ignorenulls) is the two-pass range-partitioned carry from
    operators/rank.py: range-partition the union on (key, ts, side) —
    a giant key spans many partitions — then pass 1 collects each
    (partition, key)'s LAST right struct (bounded rows), pass 2
    forward-fills within partitions seeded by the newest preceding
    partition's struct. Struct payloads ride Arrow as dicts, so any
    value-column types work (unlike stratified_locf's float-only
    carry).

    Requirements: (key, right_ts) must be UNIQUE on the right side
    (pre-reduce it — ties would make the carried pick ambiguous);
    left rows never need a tie-break (equal-ts left rows all receive
    the same preceding right struct). Right rows with a NULL timestamp
    are dropped up front — `ts >= NULL` is UNKNOWN, so they can never
    match (DuckDB ASOF agrees), and letting them into the union would
    both sort nulls-first into spurious early fills and NULL out the
    pass-1 carry seeds."""
    from .rank import _extend_schema, _per_partition_agg, _runs, _sorted_layout

    right = right.filter(F.col(right_ts).isNotNull())
    r_dtypes = dict(right.dtypes)
    rv_fields = list(value_cols)  # right_ts never read downstream
    rv_type = "struct<" + ",".join(f"{c}:{r_dtypes[c]}" for c in rv_fields) + ">"
    lrow_type = "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
    lv = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rv = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.struct(*[F.col(c) for c in rv_fields]).alias("_rv"),
    )
    un = rv.unionByName(lv)
    # adaptive=False (round 13): like stratified_lead, this kernel's
    # cost is per-ROW object work (struct payloads ride Arrow as
    # dicts), so parallelism beats any scheduling saving a
    # size-derived partition count buys — the 10x fixture measured the
    # size-derived layout 5x slower (j8_asof_low_card 5.6 -> 28.7 s)
    # before this opt-out.
    srt, n_parts = _sorted_layout(
        un, ["_k"], ["_ts", "_is_left"], num_partitions, adaptive=False
    )
    by_stratum = _per_partition_agg(
        srt.filter(F.col("_is_left") == 0),  # narrow op: partition ids kept
        ["_k"],
        F.max_by("_rv", F.col("_ts")).alias("_lv"),
    )
    carry: dict[tuple, dict] = {}  # (pid, key) -> seed struct as dict
    for key, lst in by_stratum.items():
        lv_by_pid = {pid: r["_lv"].asDict(recursive=True) for pid, r in lst}
        prev = None
        for pid in range(n_parts):
            if prev is not None:
                carry[(pid, *key)] = prev
            if pid in lv_by_pid:
                prev = lv_by_pid[pid]
    bo = srt.sparkSession.sparkContext.broadcast(carry)

    from pyspark.sql.types import StructField

    out_schema = _extend_schema(
        srt, [StructField("_fv", srt.schema["_rv"].dataType)]
    )

    def fill_gen(batches):
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seeds = bo.value
        running: dict[tuple, object] = {}  # key -> last struct dict|None
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            col = pd.Series(list(pdf["_rv"]), dtype=object)
            out = pd.Series([None] * n, dtype=object)
            for key, s, e in _runs(pdf, ["_k"]):
                filled = col.iloc[s:e].reset_index(drop=True).ffill()
                if key in running:
                    prev = running[key]
                else:
                    prev = seeds.get((pid, *key))
                if prev is not None:
                    # NOTE: fillna(dict) would be misread as a
                    # column mapping — mask-assign the struct instead
                    mask = filled.isna()
                    if mask.any():
                        filled = filled.copy()
                        filled[mask] = pd.Series(
                            [prev] * int(mask.sum()), index=filled.index[mask]
                        )
                out.iloc[s:e] = filled.to_numpy()
                last = filled.iloc[-1]
                running[key] = last if isinstance(last, dict) else None
            res = pdf.copy()
            res["_fv"] = pd.Series(out.to_numpy(), index=pdf.index, dtype=object)
            yield res

    filled = srt.mapInPandas(fill_gen, out_schema)
    return filled.filter(F.col("_is_left") == 1).select(
        "_lrow.*", *[F.col(f"_fv.{c}").alias(c) for c in value_cols]
    )
