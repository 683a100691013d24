"""Table-maintenance operators: small-files compaction.

The small-files problem is the canonical 100 TB lake pathology:
streaming sinks and over-parallel writers leave millions of KB-sized
parquet files, and every subsequent scan pays per-file open/footer
costs plus a task per file. Compaction rewrites a directory into
target-sized files WITHOUT changing its contents.

100 TB stance: compaction here is shuffle-free. The scan packs many
small files into few input partitions (Spark's own
``files.maxPartitionBytes``/``openCostInBytes`` bin-packing), and
``coalesce(n_out)`` merges partitions WITHOUT an exchange — each output
task streams several input files into one output file. A
``repartition`` would shuffle every byte of the table to achieve the
same file count; the only reason to accept that cost is changing the
clustering (that operator exists: ``x_zorder_layout``). Per-partition
target sizing uses file metadata only (driver-side listing, O(files)).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory — driver-side
    listing, metadata only."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_files(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``in_dir`` (parquet) into ``out_dir`` with ~target-sized
    files. Returns a manifest dict: files/bytes before and after, rows,
    and the output file count chosen.

    n_out = ceil(input_bytes / target): compressed input bytes predict
    compressed output bytes well for a same-codec rewrite (row-group
    re-encoding wobble is why the size test asserts a 2x envelope, not
    equality)."""
    n_in, bytes_in = dir_stats(in_dir)
    n_out = max(1, math.ceil(bytes_in / target_bytes))
    df = spark.read.parquet(in_dir)
    df.coalesce(n_out).write.mode("overwrite").parquet(out_dir)
    n_after, bytes_after = dir_stats(out_dir)
    return {
        "files_before": n_in,
        "bytes_before": bytes_in,
        "files_after": n_after,
        "bytes_after": bytes_after,
        "n_out": n_out,
    }


def compaction_plan_is_shuffle_free(spark: SparkSession, in_dir: str) -> bool:
    """True iff the compaction read+coalesce plan contains no Exchange —
    the contract that distinguishes coalesce-compaction from a rewrite
    shuffle (asserted in tests/test_maintenance.py)."""
    df = spark.read.parquet(in_dir).coalesce(1)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return "Exchange" not in plan


def compact_delta_log(
    spark: SparkSession,
    delta_dir: str,
    key_cols: list,
    sum_cols: list,
    target_bytes: int = 128 * 1024 * 1024,
    fold: str = "sum",
) -> dict:
    """LSM compaction for an APPEND-ONLY DELTA LOG (round 9, VERDICT r8
    #4): the streaming maintainers (e8_stream_index_update,
    x3_stream_markov, x_stream_bitmap_distinct, the attribution click
    index) append one parquet delta per micro-batch forever — at
    production batch counts that is exactly the small-files pathology
    x_compact_small_files exists to fix, PLUS unbounded fold work at
    serve time. This pass folds the log into one base generation:
    deltas summed per key (sum is associative + commutative, so every
    serving read — groupBy key, sum deltas — is value-identical before
    and after), written as ~target-sized files, then ATOMICALLY
    swapped in (stage dir + rename; a concurrent reader sees either
    the old log or the new base, never a mix). Unlike compact_files'
    shuffle-free rewrite, folding IS one partial-aggregable shuffle of
    the delta rows — the point: pay it once at compaction instead of
    on every serve. Idempotent: compacting a compacted log rewrites
    the same folded rows.

    Returns the manifest: files/bytes before and after, key count."""
    import shutil

    from pyspark.sql import functions as F

    n_in, bytes_in = dir_stats(delta_dir)
    df = spark.read.parquet(delta_dir)
    if sum_cols:
        # fold picks the merge semiring: "sum" for count/tf deltas,
        # "bit_or" for bitmap-word logs (x_stream_bitmap_distinct),
        # "max" for HLL register logs (x_stream_hll_distinct) — all
        # associative + commutative, the property that makes the
        # compacted base serve value-identically
        fns = {"sum": F.sum, "bit_or": F.bit_or, "max": F.max}
        folded = df.groupBy(*key_cols).agg(
            *[fns[fold](c).alias(c) for c in sum_cols]
        )
    else:
        # membership log (e.g. a seen-ids set): the fold is distinct
        folded = df.select(*key_cols).distinct()
    n_out = max(1, math.ceil(bytes_in / target_bytes))
    stage, old = delta_dir + ".compact", delta_dir + ".old"
    shutil.rmtree(stage, ignore_errors=True)
    folded.coalesce(n_out).write.parquet(stage)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(delta_dir, old)
    os.rename(stage, delta_dir)
    shutil.rmtree(old)
    n_after, bytes_after = dir_stats(delta_dir)
    return {
        "files_before": n_in,
        "bytes_before": bytes_in,
        "files_after": n_after,
        "bytes_after": bytes_after,
        "n_out": n_out,
    }
