"""Distributed stratified rank — row_number() within strata WITHOUT a
per-stratum window partition.

`Window.partitionBy(stratum)` puts an ENTIRE stratum into one task: with
low-cardinality strata (language, source) a 100 TB corpus divides into a
handful of window partitions, parallelism collapses to the stratum
count, and one task sorts corpus/|strata| rows — the same shape flaw the
round-6 mergeable partial top-k removed from the ANN family, but for
full rankings (median cuts, percentile gates, tertile buckets) where a
bounded top-k cannot apply because the cut keeps O(stratum) rows.

The classic fix is the two-pass range-partitioned rank (TeraSort-style):

1. range-repartition on (strata..., order...) — Spark's RangePartitioner
   samples split bounds, so a giant stratum SPANS MANY partitions and
   every partition is ~corpus/n_partitions regardless of skew — then
   sort within partitions (a distributed sort, not a per-stratum one);
2. pass 1: per-(physical partition, stratum) row counts — a
   partial-aggregable groupBy whose result is ≤ n_partitions × |strata|
   rows — collected and turned into per-(partition, stratum) starting
   offsets plus per-stratum totals;
3. pass 2: a mapInPandas walk over the same sorted partitions assigns
   rank = offset + local position (and attaches the stratum total).

Ranks are exact and partition-layout-independent: they equal
row_number() over (partition by strata order by order) whenever
(strata..., order...) is a total order (callers append a unique id).
Determinism across the two passes holds because RangePartitioner's
sampling is seeded per partition index — identical input, identical
bounds.

Cost vs the window form: one extra pass over the sorted data (the
count job). At 100 TB that buys per-stratum work distributed over the
whole cluster instead of |strata| tasks.

:func:`stratified_cumsum` (prefix sums) and :func:`stratified_locf`
(forward fill) ride the same skeleton with a different pass-1 aggregate
and pass-2 kernel; :func:`histogram_select` is the cheap sibling for
rank SELECTIONS (value at rank k), windowing only over per-(stratum,
value) histograms. All pass-1 collects are bounded by
n_partitions × |strata| rows — these operators are for LOW-cardinality
strata (the regime where the window form collapses); for
high-cardinality strata the plain window is already well-distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_bounded_rank(df: DataFrame, order, rank_col: str = "rnk") -> DataFrame:
    """1-based rank attach for provably BOUNDED frames (round 9,
    VERDICT r8 #9) with NO WindowExec: the post-limit rank attach
    (top-k already cut to <= k rows by TakeOrderedAndProject) ran an
    unpartitioned row_number Window, and WindowExec logs the 'No
    Partition Defined' ambiguity for it — noise that could mask a REAL
    corpus-sized single-partition window later (an explicit literal
    partition key does not help: Catalyst folds it away). Instead:
    coalesce(1) + sortWithinPartitions(order) + consecutive ids —
    monotonically_increasing_id over ONE partition is exactly 0..n-1
    in row order, and being non-deterministic it is never pushed
    through the sort. Identical output to the window form. Do NOT use
    over corpus-scaling frames — that is what stratified_rank is for."""
    out = df.coalesce(1).sortWithinPartitions(*order)
    return out.withColumn(
        rank_col, (F.monotonically_increasing_id() + 1).cast("int")
    )


# Round 13 (VERDICT r12 #2, guide §2.2): the TeraSort layout's
# partition count was a flat defaultParallelism — 32 partitions for a
# 2 MB input at the bench SF, so every two-pass operator paid 32-task
# scheduling, 32 checkpoint partitions and a 32-row-per-stratum pass-1
# collect for data that fits in one task. The count now derives from
# the optimizer's size estimate: ceil(bytes / target) clamped to
# [1, defaultParallelism]. Unknown/huge estimates (joins, generators —
# Spark's fallback is effectively infinite) keep the old behavior
# exactly; provably-small inputs collapse to few partitions. The cap
# is the SAME pre-AQE upper bound as before, so cluster-scale behavior
# is unchanged — this is scale-ADAPTIVE, not a local[32] constant
# (the r12 scaling block showed the whole family running FASTER on 8
# cores than 32: pure scheduling overhead at small SF).
#
# Target calibration (measured at sf0.1 AND the 10x sf1.0 fixture):
# the estimate is COMPRESSED parquet bytes, and the pass-2 kernels pay
# per-ROW pandas/Arrow cost on top of the scan, so the per-task budget
# must be far below the guide's 128 MB-1 GB shuffle band. 4 MiB
# compressed (~tens of MB in memory) measured best-or-tied for the
# vectorized kernels at both SFs (x_ntile 1.42 vs flat 1.46 at sf1.0,
# x_locf 0.77 vs 1.02, x_ks 1.85 vs 2.02; 64 MiB was 1.5-4x WORSE at
# sf1.0 — one task serialized a 1M-row kernel). stratified_lead opts
# out entirely (adaptive=False): its kernel does object-dtype per-row
# work where parallelism dominates any scheduling saving (legacy 1.77
# vs 2.83 s even at the 4 MiB target, sf1.0).
_RANK_TARGET_BYTES_ENV = "SPARK_GRAFT_RANK_PARTITION_BYTES"
_RANK_TARGET_BYTES_DEFAULT = 4 << 20  # compressed-input bytes per task


def _adaptive_partitions(df: DataFrame, cap: int) -> int:
    import os

    try:
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est = int(est) if isinstance(est, int) else int(est.toString())
    except Exception:
        return cap
    if est <= 0:
        return cap
    target = int(
        os.environ.get(_RANK_TARGET_BYTES_ENV, str(_RANK_TARGET_BYTES_DEFAULT))
    )
    return max(1, min(cap, -(-est // target)))


def _sorted_layout(
    df: DataFrame, strata_cols, order_cols, num_partitions, adaptive: bool = True
):
    """The shared TeraSort layout: range-partition on (strata, order),
    sort within partitions, and LAZILY checkpoint so pass 1 (the
    bounded aggregate) and pass 2 (the kernel walk) read the SAME
    materialized partitions — RangePartitioner samples its split
    bounds per execution, and two independent executions (AQE re-plans
    upstream stages) can legitimately pick different bounds, which
    would misalign the per-partition offsets. One materialization also
    means the distributed sort runs once: sort, then two cheap
    passes. Partition count: caller override > size-adaptive derive
    (see _adaptive_partitions; ``adaptive=False`` keeps the flat
    defaultParallelism — for kernels whose per-row Python cost makes
    parallelism worth more than scheduling savings)."""
    default_n = df.sparkSession.sparkContext.defaultParallelism
    n_parts = num_partitions or (
        _adaptive_partitions(df, default_n) if adaptive else default_n
    )
    keys = [*strata_cols, *order_cols]
    srt = (
        df.repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .localCheckpoint(eager=False)
    )
    return srt, n_parts


# Round 13 (VERDICT r12 "What's wrong #6"): the pass-1 collect is
# bounded by n_partitions x |strata| rows, but that bound GROWS with
# both factors and nobody had marked where the driver cliff sits — a
# high-cardinality stratum column at cluster scale would push the
# collect toward driver OOM with no warning. The bound is now checked
# loudly: past $SPARK_GRAFT_RANK_COLLECT_MAX rows (default 5M —
# ~500 MB of Rows, well inside the 8 GiB driver this engine
# configures) the operator raises with guidance. The check runs after
# the collect, so it is a tripwire at the documented boundary (where
# the rows still fit comfortably), not OOM-proofing far past it; its
# job is to stop silent growth several doublings before the cliff.
# These operators are documented for LOW-cardinality strata; the error
# names the alternative (plain window) for the high-cardinality regime.
_RANK_COLLECT_MAX_ENV = "SPARK_GRAFT_RANK_COLLECT_MAX"
_RANK_COLLECT_MAX_DEFAULT = 5_000_000


def _per_partition_agg(srt: DataFrame, strata_cols, *aggs):
    """Pass 1: the bounded per-(physical partition, stratum) aggregate,
    collected and grouped as {stratum_key: [(pid, Row), ...]} with each
    list sorted by pid. Result size ≤ n_partitions × |strata| rows —
    corpus-size-independent, and loudly capped (see
    _RANK_COLLECT_MAX_ENV above)."""
    import os

    rows = (
        srt.groupBy(F.spark_partition_id().alias("_pid"), *strata_cols)
        .agg(*aggs)
        .collect()
    )
    cap = int(os.environ.get(_RANK_COLLECT_MAX_ENV, str(_RANK_COLLECT_MAX_DEFAULT)))
    if len(rows) > cap:
        raise RuntimeError(
            f"stratified-rank pass-1 collect returned {len(rows)} rows "
            f"(> {cap}): the strata column is too high-cardinality for "
            "the two-pass skeleton's driver-side offsets — use the plain "
            "window form (well-distributed at high stratum cardinality) "
            f"or raise ${_RANK_COLLECT_MAX_ENV}"
        )
    by_stratum: dict[tuple, list] = {}
    for r in rows:
        by_stratum.setdefault(tuple(r[c] for c in strata_cols), []).append(
            (r["_pid"], r)
        )
    for lst in by_stratum.values():
        lst.sort(key=lambda t: t[0])
    return by_stratum


def _extend_schema(srt: DataFrame, new_fields):
    """A FRESH StructType: .add() mutates the DataFrame's cached
    schema."""
    from pyspark.sql.types import StructType

    return StructType(list(srt.schema.fields) + list(new_fields))


def _runs(pdf, s_cols):
    """Contiguous stratum runs of a SORTED batch as
    [(key_tuple, start, end_exclusive), ...] — the sorted layout
    guarantees each stratum occupies one contiguous slice per batch, so
    the pass-2 kernels do their per-row work VECTORIZED (numpy/pandas C
    loops) and pay Python only once per run (<= |strata in batch| + 1
    iterations). With NO strata the whole batch is one run. Key tuples
    are built through pandas .iloc (NOT raw numpy scalars): Series
    access converts datetime64 to pd.Timestamp, which hashes/compares
    equal to the datetime.datetime keys in the broadcast offset dicts —
    a raw np.datetime64 silently matches NOTHING there."""
    import numpy as np

    n = len(pdf)
    if not s_cols:
        return [((), 0, n)]
    cols = [pdf[c].to_numpy() for c in s_cols]
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for arr in cols:
        change[1:] |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    series = [pdf[c] for c in s_cols]
    return [
        (tuple(col.iloc[int(s)] for col in series), int(s), int(e))
        for s, e in zip(starts, ends)
    ]


_INTEGRAL_TYPES = {"byte", "short", "integer", "long"}


def stratified_cumsum(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    value_col: str | list[str],
    out_col: str | list[str] = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of ``value_col`` within each
    stratum by order_cols — `sum() OVER (PARTITION BY strata ORDER BY
    order ROWS UNBOUNDED PRECEDING..CURRENT)` without the per-stratum
    window (which runs each stratum's whole corpus slice through one
    task).

    Same TeraSort skeleton as :func:`stratified_rank`; pass 1
    aggregates per-(partition, stratum) value sums and non-null counts
    (bounded rows, collected) and turns them into carry-in offsets;
    pass 2 adds offset + local running sum.

    ``value_col``/``out_col`` may be parallel LISTS (round 12): several
    prefix sums over the SAME (strata, order) ride one sorted layout —
    one range exchange + sort, one bounded pass-1 collect, one kernel
    pass — instead of re-running the whole two-pass skeleton per column
    (x_ks_drift_test's cum1/cum2 paid the layout twice).

    Semantics match the window form exactly, including nulls: null
    values contribute nothing, a row's cum is the running sum of
    non-null values so far, and rows BEFORE the stratum's first
    non-null value get NULL (SQL sum over an all-null frame). Restricted
    to integral ``value_col`` (exact int64 accumulation, the same
    associativity-safe regime as the window form; float running sums
    are order-sensitive and refused rather than silently truncated).
    Individual values must stay within ±2^53 when nulls are present
    (Arrow ships a nullable int column to pandas as float64).
    (strata + order) must be a total order for a deterministic result —
    append a unique id."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lists must pair up")
    for vc in value_cols:
        vtype = df.schema[vc].dataType.typeName()
        if vtype not in _INTEGRAL_TYPES:
            raise TypeError(
                f"stratified_cumsum requires an integral value column, got "
                f"{vc}: {vtype} (float running sums are order-"
                "sensitive; quantize to integers first)"
            )
    # internal pass-1 aliases; a colliding stratum name silently
    # shadows the per-partition sums (caught the hard way in round 9)
    clash = (
        {f"_s{i}" for i in range(len(value_cols))}
        | {f"_cnt{i}" for i in range(len(value_cols))}
        | {"_pid"}
    ) & set(strata_cols)
    if clash:
        raise ValueError(f"strata_cols collide with internal names: {clash}")
    srt, n_parts = _sorted_layout(df, strata_cols, order_cols, num_partitions)
    aggs = []
    for i, vc in enumerate(value_cols):
        aggs.append(F.sum(vc).alias(f"_s{i}"))
        aggs.append(F.count(vc).alias(f"_cnt{i}"))
    by_stratum = _per_partition_agg(srt, strata_cols, *aggs)
    # (pid, *stratum) -> per-column (carry-in sum, any non-null precedes)
    offsets: dict[tuple, tuple] = {}
    for key, lst in by_stratum.items():
        per_pid = {pid: r for pid, r in lst}
        run = [0] * len(value_cols)
        seen = [False] * len(value_cols)
        for pid in range(n_parts):
            # tuple(zip(...)) snapshots the scalar values, so in-place
            # mutation below is safe (ADVICE r12: the per-iteration
            # list() rebinds were dead copies in an O(partitions x
            # strata x columns) loop)
            offsets[(pid, *key)] = tuple(zip(run, seen))
            r = per_pid.get(pid)
            if r is not None:
                for i in range(len(value_cols)):
                    if r[f"_cnt{i}"] > 0:
                        run[i] += r[f"_s{i}"]
                        seen[i] = True
    bo = srt.sparkSession.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField

    out_schema = _extend_schema(
        srt, [StructField(oc, LongType()) for oc in out_cols]
    )
    s_cols = list(strata_cols)

    def cumsum_gen(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = bo.value
        # per stratum key: per-column (running sum, any non-null seen)
        running: dict[tuple, tuple] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            pdf = pdf.copy()
            runs = _runs(pdf, s_cols)
            carried = {}
            for ci, (vc, oc) in enumerate(zip(value_cols, out_cols)):
                vals = pdf[vc].to_numpy()
                isna = pd.isna(vals)
                # per-element int64 BEFORE summing: exact for |v| < 2^53
                # even when nulls forced the column to float64; the
                # running SUM then accumulates in int64 with no 2^53
                # ceiling
                filled = np.where(isna, 0, vals).astype("int64")
                out = np.empty(n, dtype="int64")
                null_mask = np.empty(n, dtype=bool)
                for key, s, e in runs:
                    cur, seen = (running.get(key) or off[(pid, *key)])[ci]
                    seg = filled[s:e].cumsum() + cur
                    nn = (~isna[s:e]).cumsum()
                    out[s:e] = seg
                    null_mask[s:e] = (nn == 0) & (not seen)
                    carried.setdefault(key, [None] * len(value_cols))[ci] = (
                        int(seg[-1]),
                        seen or bool(nn[-1] > 0),
                    )
                res = pd.array(out, dtype="Int64")
                res[null_mask] = pd.NA
                pdf[oc] = res
            for key, states in carried.items():
                running[key] = tuple(states)
            yield pdf

    return srt.mapInPandas(cumsum_gen, out_schema)


def stratified_cummin(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_min",
    excl_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive running MIN of ``value_col`` within each
    stratum by order_cols — `min() OVER (PARTITION BY strata ORDER BY
    order ROWS UNBOUNDED PRECEDING..CURRENT)` without the per-stratum
    window. The running-extreme carry (high/low-watermark, prefix
    frontier) rides the same TeraSort skeleton as
    :func:`stratified_cumsum`: pass 1 collects the bounded
    per-(partition, stratum) min + non-null count, turns them into
    carry-in minima, pass 2 is a vectorized ``np.minimum.accumulate``
    per stratum run.

    Null semantics match the window form: nulls contribute nothing and
    rows before the stratum's first non-null get NULL. Integral values
    only (same guard as cumsum — one rule for the family; min itself is
    order-free, but a float column here usually signals an unquantized
    metric upstream). For a running MAX, negate in and out.

    ``excl_col`` additionally emits the EXCLUSIVE prefix min (the
    running min over strictly-preceding rows; NULL on each stratum's
    first-non-null-preceded rows) from the same kernel pass — the
    strict-dominance frontier consumers like x_skyline need, without a
    second two-pass operator.
    (strata + order) must be a total order — append a unique id."""
    vtype = df.schema[value_col].dataType.typeName()
    if vtype not in _INTEGRAL_TYPES:
        raise TypeError(
            f"stratified_cummin requires an integral value column, got "
            f"{value_col}: {vtype} (quantize to integers first)"
        )
    srt, n_parts = _sorted_layout(df, strata_cols, order_cols, num_partitions)
    by_stratum = _per_partition_agg(
        srt,
        strata_cols,
        F.min(value_col).alias("_m"),
        F.count(value_col).alias("_cnt"),
    )
    _SENT = (1 << 63) - 1  # int64 max: identity for min
    # (pid, *stratum) -> (carry-in min, whether any non-null precedes)
    offsets: dict[tuple, tuple[int, bool]] = {}
    for key, lst in by_stratum.items():
        per_pid = {pid: r for pid, r in lst}
        cur, seen = _SENT, False
        for pid in range(n_parts):
            offsets[(pid, *key)] = (cur, seen)
            r = per_pid.get(pid)
            if r is not None and r["_cnt"] > 0:
                cur = min(cur, int(r["_m"]))
                seen = True
    bo = srt.sparkSession.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField

    new_fields = [StructField(out_col, LongType())]
    if excl_col is not None:
        new_fields.append(StructField(excl_col, LongType()))
    out_schema = _extend_schema(srt, new_fields)
    s_cols = list(strata_cols)

    def cummin_gen(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = bo.value
        running: dict[tuple, tuple[int, bool]] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            vals = pdf[value_col].to_numpy()
            isna = pd.isna(vals)
            # nulls become the min-identity sentinel so accumulate skips
            # them. Two steps: _SENT is not float64-representable (a
            # float round-trip lands on 2^63 and overflows the int64
            # cast to int64 MIN — the opposite identity), so cast the
            # non-null values first (exact for |v| < 2^53 even when
            # nulls forced float64), then assign the sentinel in int64.
            filled = np.where(isna, 0, vals).astype("int64")
            filled[isna] = _SENT
            out = np.empty(n, dtype="int64")
            null_mask = np.empty(n, dtype=bool)
            if excl_col is not None:
                excl = np.empty(n, dtype="int64")
                excl_null = np.empty(n, dtype=bool)
            for key, s, e in _runs(pdf, s_cols):
                cur, seen = running.get(key) or off[(pid, *key)]
                seg = np.minimum.accumulate(
                    np.minimum(filled[s:e], np.int64(cur))
                )
                nn = (~isna[s:e]).cumsum()
                out[s:e] = seg
                null_mask[s:e] = (nn == 0) & (not seen)
                if excl_col is not None:
                    # exclusive = inclusive shifted one row down the run,
                    # seeded with the carry-in state
                    excl[s] = cur
                    excl[s + 1 : e] = seg[:-1]
                    excl_null[s] = not seen
                    excl_null[s + 1 : e] = (nn[:-1] == 0) & (not seen)
                running[key] = (int(seg[-1]), seen or bool(nn[-1] > 0))
            res = pd.array(out, dtype="Int64")
            res[null_mask] = pd.NA
            pdf = pdf.copy()
            pdf[out_col] = res
            if excl_col is not None:
                eres = pd.array(excl, dtype="Int64")
                eres[excl_null] = pd.NA
                pdf[excl_col] = eres
            yield pdf

    return srt.mapInPandas(cummin_gen, out_schema)


def stratified_locf(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "filled",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed LOCF (last observation carried forward): nulls in
    ``value_col`` take the most recent non-null value within their
    stratum by order_cols — WITHOUT a per-stratum running window (which
    would forward-fill each stratum's entire corpus slice in one task).

    Same TeraSort skeleton as :func:`stratified_rank`; pass 1
    aggregates each (partition, stratum)'s LAST non-null value (bounded
    rows, collected); the carry-in for a partition is the newest
    non-null among all PRECEDING partitions of the stratum; pass 2
    forward-fills within each partition seeded by its carry-in. Fill
    values are carried verbatim (no arithmetic), so results are
    bit-identical to last(ignorenulls) over the running window for
    NaN-free input. ``value_col`` must be a float/double column (pandas
    NaN round-trips to SQL null through Arrow), and a genuine NaN
    OBSERVATION is treated as missing — Arrow conflates NaN with SQL
    null on the kernel side, so both passes filter NaN alike; the
    window form would instead carry NaN forward as a real value.
    Leading nulls (no prior observation anywhere) stay null.
    (strata + order) must be a total order for a deterministic result —
    append a unique id."""
    srt, n_parts = _sorted_layout(df, strata_cols, order_cols, num_partitions)
    # NaN filtered alongside null: the pass-2 kernel cannot tell them
    # apart after Arrow, so pass 1 must not elect a NaN as a carry value
    by_stratum = _per_partition_agg(
        srt.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col)),
        strata_cols,
        F.max_by(value_col, F.struct(*[F.col(c) for c in order_cols])).alias("_lv"),
    )
    carry: dict[tuple, object] = {}  # (pid, *stratum) -> seed value
    for key, lst in by_stratum.items():
        # every partition after the stratum's first non-null gets a
        # seed — including partitions holding only NULL rows of the
        # stratum (they appear in no aggregate row but still fill)
        lv_by_pid = {pid: r["_lv"] for pid, r in lst}
        prev = None
        for pid in range(n_parts):
            if prev is not None:
                carry[(pid, *key)] = prev
            if pid in lv_by_pid:
                prev = lv_by_pid[pid]
    bo = srt.sparkSession.sparkContext.broadcast(carry)

    from pyspark.sql.types import StructField

    out_schema = _extend_schema(
        srt, [StructField(out_col, srt.schema[value_col].dataType)]
    )
    s_cols = list(strata_cols)

    def fill_gen(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seeds = bo.value
        # carried fill value per stratum; None = established "no value"
        # (all null so far AND no seed) — distinct from absent
        running: dict[tuple, object] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            col = pd.Series(pdf[value_col].to_numpy(), copy=False)
            out = np.empty(n, dtype="float64")
            for key, s, e in _runs(pdf, s_cols):
                filled = col.iloc[s:e].ffill()
                if key in running:
                    prev = running[key]
                else:
                    prev = seeds.get((pid, *key))
                if prev is not None:
                    filled = filled.fillna(prev)
                seg = filled.to_numpy()
                out[s:e] = seg
                last = seg[-1]
                running[key] = None if pd.isna(last) else last
            res = pdf.copy()
            res[out_col] = pd.Series(out, index=pdf.index, dtype="float64")
            yield res

    return srt.mapInPandas(fill_gen, out_schema)


def stratified_lead(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
    suffix: str = "_next",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed lead(1): each row gains the NEXT row's
    ``value_cols`` within its stratum by order_cols — `lead(v) OVER
    (PARTITION BY strata ORDER BY order)` without the per-stratum
    window. The last row of a stratum gets NULLs, exactly like the
    window form.

    Same TeraSort skeleton: pass 1 aggregates each (partition,
    stratum)'s FIRST row's values (min_by over the order key — bounded
    rows, collected); the boundary seed for a partition's last row of a
    stratum is the first row of that stratum in the NEAREST following
    partition that holds one; pass 2 walks the sorted partitions
    emitting each row with its successor's values (rows of a stratum
    are contiguous within a sorted partition, so the in-partition
    successor is simply the next row when strata match). Values are
    carried verbatim — bit-identical to the window form.
    (strata + order) must be a total order — append a unique id.

    adaptive=False (round 13): lead's pass-2 kernel does object-dtype
    per-row work (tolist + boundary patching), so its cost scales with
    rows-per-task, not scan bytes — the flat defaultParallelism layout
    beat every size-derived count at the 10x fixture (see the
    _RANK_TARGET_BYTES_DEFAULT calibration note)."""
    srt, n_parts = _sorted_layout(
        df, strata_cols, order_cols, num_partitions, adaptive=False
    )
    by_stratum = _per_partition_agg(
        srt,
        strata_cols,
        *[
            F.min_by(c, F.struct(*[F.col(o) for o in order_cols])).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    # (pid, *stratum) -> tuple of the stratum's first-row values in the
    # nearest FOLLOWING partition (the lead for this partition's last
    # stratum row); absent key = stratum ends here -> NULLs
    seeds: dict[tuple, tuple] = {}
    for key, lst in by_stratum.items():
        firsts = {pid: tuple(r[f"_f_{c}"] for c in value_cols) for pid, r in lst}
        nxt = None
        for pid in range(n_parts - 1, -1, -1):
            if nxt is not None:
                seeds[(pid, *key)] = nxt
            if pid in firsts:
                nxt = firsts[pid]
    bo = srt.sparkSession.sparkContext.broadcast(seeds)

    from pyspark.sql.types import StructField

    out_schema = _extend_schema(
        srt,
        [
            StructField(c + suffix, srt.schema[c].dataType)
            for c in value_cols
        ],
    )
    s_cols = list(strata_cols)
    v_cols = list(value_cols)
    out_names = [c + suffix for c in value_cols]

    def lead_gen(batches):
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sds = bo.value
        none_row = (None,) * len(v_cols)

        def finish(pdf, leads_tail):
            """Attach lead columns vectorized: shift(-1) within the
            batch, then patch only run boundaries (the last row of each
            stratum run takes its cross-partition seed; the batch-final
            row takes leads_tail, resolved by the caller)."""
            import numpy as np

            out = pdf.copy()
            n = len(pdf)
            runs = _runs(pdf, s_cols)
            for j, (vc, name) in enumerate(zip(v_cols, out_names)):
                # tolist(), not to_numpy(): np.datetime64[ns] scalars in
                # an object column get unit-misread by Arrow (year
                # 55971); tolist() yields pd.Timestamp / Python ints —
                # exactly what the per-row form shipped
                vals = pdf[vc].tolist()
                obj = np.empty(n, dtype=object)
                obj[: n - 1] = vals[1:]
                for key, s, e in runs:
                    if e < n:  # run ends inside the batch: next row is
                        # a DIFFERENT stratum -> boundary seed
                        obj[e - 1] = sds.get((pid, *key), none_row)[j]
                obj[n - 1] = leads_tail[j]
                out[name] = pd.Series(obj, index=pdf.index, dtype=object)
            return out

        pend = None  # previous batch, lead of ITS last row still unknown
        for pdf in batches:
            if not len(pdf):
                continue
            if pend is not None:
                pk = tuple(pend[c].iloc[-1] for c in s_cols)
                ck = tuple(pdf[c].iloc[0] for c in s_cols)
                tail = (
                    tuple(pdf[c].iloc[0] for c in v_cols)
                    if ck == pk
                    else sds.get((pid, *pk), none_row)
                )
                yield finish(pend, tail)
            pend = pdf
        if pend is not None:
            pk = tuple(pend[c].iloc[-1] for c in s_cols)
            yield finish(pend, sds.get((pid, *pk), none_row))

    return srt.mapInPandas(lead_gen, out_schema)


def histogram_select(
    df: DataFrame,
    strata_cols: list[str],
    value_col: str,
    rank_fn,
    out_col: str,
) -> DataFrame:
    """Exact per-stratum rank SELECTION (median, decile cut, any
    "value at rank k(m)") via a value histogram — the cheap sibling of
    :func:`stratified_rank` for when only the selected VALUE is needed,
    not per-row ranks: a partial-aggregable groupBy collapses the
    corpus to (stratum, value, count) map-side, and the selection is a
    cumulative-count cut over that bounded table. The windows here run
    over HISTOGRAM rows (distinct values per stratum) — never corpus
    rows, so no stratum ever concentrates its corpus slice in one task.

    ``rank_fn(m)`` maps the stratum row count (Column) to the 1-based
    target rank (floored); returns one row per stratum:
    (strata..., out_col) = the smallest value whose cumulative count
    reaches the target — exactly the value at that rank in the sorted
    stratum (lower selection on ties)."""
    from pyspark.sql.window import Window

    hist = df.groupBy(*strata_cols, value_col).agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy(*strata_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*strata_cols)
    sel = hist.select(
        *strata_cols,
        value_col,
        F.sum("_c").over(w_cum).alias("_cum"),
        F.floor(rank_fn(F.sum("_c").over(w_all))).alias("_t"),
    )
    return (
        sel.filter(F.col("_cum") >= F.col("_t"))
        .groupBy(*strata_cols)
        .agg(F.min(value_col).alias(out_col))
    )


def stratified_rank(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rnk",
    total_col: str = "n_stratum",
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns plus ``rank_col`` (1-based row_number within
    the stratum by order_cols) and ``total_col`` (stratum row count).
    (strata + order) must be a total order — append a unique id."""
    srt, _ = _sorted_layout(df, strata_cols, order_cols, num_partitions)

    # pass 1: bounded (partition, stratum) counts -> offsets + totals
    by_stratum = _per_partition_agg(
        srt, strata_cols, F.count("*").alias("_c")
    )
    offsets: dict[tuple, int] = {}  # (pid, *stratum) -> rank offset
    totals: dict[tuple, int] = {}
    for key, lst in by_stratum.items():
        run = 0
        for pid, r in lst:
            offsets[(pid, *key)] = run
            run += r["_c"]
        totals[key] = run
    bo = srt.sparkSession.sparkContext.broadcast((offsets, totals))

    from pyspark.sql.types import LongType, StructField

    out_schema = _extend_schema(
        srt,
        [StructField(rank_col, LongType()), StructField(total_col, LongType())],
    )
    s_cols = list(strata_cols)

    def rank_gen(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off, tot = bo.value
        seen: dict[tuple, int] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ranks = np.empty(n, dtype="int64")
            ns = np.empty(n, dtype="int64")
            for key, s, e in _runs(pdf, s_cols):
                base = seen.get(key, 0)
                cnt = e - s
                ranks[s:e] = off[(pid, *key)] + base + np.arange(1, cnt + 1)
                ns[s:e] = tot[key]
                seen[key] = base + cnt
            pdf = pdf.copy()
            pdf[rank_col] = pd.Series(ranks, index=pdf.index)
            pdf[total_col] = pd.Series(ns, index=pdf.index)
            yield pdf

    return srt.mapInPandas(rank_gen, out_schema)
