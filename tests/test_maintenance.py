"""Small-files compaction (operators/maintenance.py): lossless rewrite,
file-count/size bounds, and the shuffle-free plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.operators import maintenance


def _shatter(spark, tmp_path, n_files=40, n_rows=4000):
    df = spark.range(n_rows).select(
        F.col("id"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("s"),
        (F.col("id") * 7 % 101).alias("v"),
    )
    small = str(tmp_path / "small")
    df.repartition(n_files).write.mode("overwrite").parquet(small)
    return small


def test_compaction_is_lossless_and_reduces_files(spark, tmp_path):
    small = _shatter(spark, tmp_path)
    out = str(tmp_path / "big")
    m = maintenance.compact_files(spark, small, out, target_bytes=64 * 1024)
    assert m["files_before"] == 40
    assert m["files_after"] == m["n_out"] < 40
    before = spark.read.parquet(small)
    after = spark.read.parquet(out)
    assert after.count() == before.count() == 4000
    # content identical: checksum over every column
    chk = lambda df: df.agg(  # noqa: E731
        F.sum(F.crc32(F.concat_ws("|", "id", "s", "v")) % 1000003).alias("c")
    ).first()["c"]
    assert chk(before) == chk(after)


def test_compaction_output_sizes_near_target(spark, tmp_path):
    small = _shatter(spark, tmp_path, n_files=40, n_rows=20000)
    out = str(tmp_path / "big")
    target = 96 * 1024
    m = maintenance.compact_files(spark, small, out, target_bytes=target)
    import os

    sizes = [
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    ]
    assert len(sizes) == m["n_out"]
    # 2x envelope: re-encoding wobble, but no file wildly over target
    assert max(sizes) <= 2 * target, sizes


def test_compaction_plan_has_no_exchange(spark, tmp_path):
    small = _shatter(spark, tmp_path, n_files=8, n_rows=500)
    assert maintenance.compaction_plan_is_shuffle_free(spark, small)
