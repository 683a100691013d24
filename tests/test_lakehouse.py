"""Lakehouse read-path pins: time-travel partition pruning, merge-on-read
semantics, and manifest file skipping (plans/lakehouse.py)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.plans.lakehouse import (
    timetravel_read,
)

SF = "/root/testdata/sf0.001"


def _write_log(spark, tmp):
    o = load(spark, SF, "orders")
    deltas = (
        o.select(
            F.lit(0).alias("v"), F.lit("i").alias("op"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("val"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 5 == 0).select(
                F.lit(1).alias("v"), F.lit("u").alias("op"),
                F.col("o_orderkey").alias("k"), F.lit("9-RESET").alias("val"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 7 == 0).select(
                F.lit(2).alias("v"), F.lit("d").alias("op"),
                F.col("o_orderkey").alias("k"),
                F.lit(None).cast("string").alias("val"),
            )
        )
    )
    deltas.write.partitionBy("v").parquet(tmp + "/log")
    return o


def test_timetravel_asof_read_prunes_later_versions(spark):
    """An as-of read's v <= N predicate must reach the scan as a
    PARTITION filter (later commits never scanned), not a data filter."""
    tmp = tempfile.mkdtemp(prefix="tt_plan_")
    try:
        _write_log(spark, tmp)
        plan = (
            timetravel_read(spark, tmp + "/log", as_of=0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "v" in m.group(1), plan
        # version-2 files must not appear in the scanned locations
        assert "v=2" not in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_timetravel_merge_on_read_semantics(spark):
    """As-of 2: %7 keys deleted, surviving %5 keys read '9-RESET',
    everything else reads its original value; as-of 0 is the base."""
    tmp = tempfile.mkdtemp(prefix="tt_sem_")
    try:
        o = _write_log(spark, tmp)
        base = {r["o_orderkey"]: r["o_orderpriority"] for r in o.collect()}
        v0 = {r["k"]: r["val"] for r in timetravel_read(spark, tmp + "/log", 0).collect()}
        assert v0 == base
        v2 = {r["k"]: r["val"] for r in timetravel_read(spark, tmp + "/log", 2).collect()}
        expected = {
            k: ("9-RESET" if k % 5 == 0 else v)
            for k, v in base.items()
            if k % 7 != 0
        }
        assert v2 == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_manifest_pruning_skips_files_and_matches_full_scan(spark):
    """The min/max manifest must let the reader skip most range-
    clustered files, and the pruned read must equal the full scan."""
    ev = load(spark, SF, "events").select("event_id", "user_id")
    lo, hi = 4, 7  # sf0.001 user_ids span 0..14
    tmp = tempfile.mkdtemp(prefix="manifest_pin_")
    try:
        ev.repartitionByRange(8, "user_id").write.parquet(tmp + "/data")
        all_rows = (
            spark.read.parquet(tmp + "/data")
            .select(F.col("_metadata.file_path").alias("path"), "user_id")
            .groupBy("path")
            .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
            .collect()
        )
        keep = [r["path"] for r in all_rows if r["hi"] >= lo and r["lo"] <= hi]
        assert 0 < len(keep) < len(all_rows), (len(keep), len(all_rows))
        pruned = (
            spark.read.parquet(*keep)
            .filter(F.col("user_id").between(lo, hi))
            .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
            .collect()[0]
        )
        full = (
            spark.read.parquet(tmp + "/data")
            .filter(F.col("user_id").between(lo, hi))
            .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
            .collect()[0]
        )
        assert (pruned["n"], pruned["s"]) == (full["n"], full["s"])
        assert pruned["n"] > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bloom_file_skip_prunes_files_and_matches_oracle(spark):
    """The bloom index must actually SKIP files (each planted key hash-
    lands in one of 8 files, so <= 3 + false positives are read; m=4096
    bits over ~file-sized key sets keeps FPs near zero) and the pruned
    read must reproduce the full-scan answer (parity pins the values;
    here we pin the ACCESS PATH via the recorded file counts)."""
    from public_transit_status_with_apache_kafka_spark.plans.lakehouse import (
        QUERIES,
    )

    out = QUERIES["x_bloom_file_skip"](spark, "/root/testdata/sf0.001").collect()
    total = int(spark.conf.get("spark.graft.bloom_files_total"))
    read = int(spark.conf.get("spark.graft.bloom_files_read"))
    # an all-empty hash partition writes a row-less file that never
    # reaches the bloom index (nothing to read there anyway)
    assert total >= 7
    assert 0 < read <= 3, (read, total)
    assert {r.user_id for r in out} <= {7, 77, 149}
    assert all(r.n_events > 0 for r in out)


def test_positional_delete_read_drops_exactly_the_deleted_rows(spark):
    """The anti-join read must hide exactly the rows the delete file
    names — no collateral loss, no survivors (parity pins aggregates;
    this pins row identity at sf0.001)."""
    from public_transit_status_with_apache_kafka_spark.plans.lakehouse import (
        QUERIES,
    )
    from public_transit_status_with_apache_kafka_spark.io_util import load

    out = {
        r.o_orderpriority: r
        for r in QUERIES["x_positional_deletes"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    o = load(spark, "/root/testdata/sf0.001", "orders")
    exp = {
        r.o_orderpriority: r
        for r in o.filter(~(F.col("o_orderkey") % 97 == 0))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_live"),
            F.sum(F.col("o_orderkey") % 1000003).cast("long").alias("key_checksum"),
        )
        .collect()
    }
    assert {k: (v.n_live, v.key_checksum) for k, v in out.items()} == {
        k: (v.n_live, v.key_checksum) for k, v in exp.items()
    }
    n_deleted = o.filter(F.col("o_orderkey") % 97 == 0).count()
    assert n_deleted > 0  # the delete file was non-trivial


def test_dynamic_partition_overwrite_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """Write mode every lakehouse job relies on for idempotent backfills:
    partitionOverwriteMode=dynamic replaces ONLY partitions present in
    the incoming frame; static mode would truncate the whole table."""
    from public_transit_status_with_apache_kafka_spark.io_util import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "user_id"
    )
    tgt = str(tmp_path / "tbl")
    ev.write.partitionBy("event_type").parquet(tgt)
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(tgt)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill ONLY the 'click' partition with a corrected subset
        fix = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 10))
        fix.write.mode("overwrite").partitionBy("event_type").parquet(tgt)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    after = {
        r.event_type: r.n
        for r in spark.read.parquet(tgt)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert after["click"] == ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 10)
    ).count()
    for k in before:
        if k != "click":
            assert after[k] == before[k], k  # untouched partitions intact
