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


def test_compact_delta_log_preserves_serving_and_bounds_files(spark, tmp_path):
    """Round 9 (VERDICT r8 #4): LSM delta-log compaction — the serving
    read (groupBy key, sum deltas) must be ROW-IDENTICAL before and
    after, the file count must collapse to the computed bound, and a
    second compaction is idempotent."""
    from public_transit_status_with_apache_kafka_spark.operators import maintenance

    d = str(tmp_path / "deltas")
    # 9 generations of per-key deltas, keys overlapping across files
    for g in range(9):
        spark.createDataFrame(
            [(f"k{(g + i) % 5}", 1, 10 + i) for i in range(4)],
            "tok string, df_delta long, tf_delta long",
        ).coalesce(1).write.mode("append").parquet(d)
    files_before, _ = maintenance.dir_stats(d)
    assert files_before == 9

    def fold():
        return {
            (r.tok, r.df, r.tf)
            for r in spark.read.parquet(d)
            .groupBy("tok")
            .agg(F.sum("df_delta").alias("df"), F.sum("tf_delta").alias("tf"))
            .collect()
        }

    pre = fold()
    m = maintenance.compact_delta_log(spark, d, ["tok"], ["df_delta", "tf_delta"])
    assert fold() == pre
    assert m["files_before"] == 9
    assert m["files_after"] <= m["n_out"] and m["files_after"] == 1
    # key count bounded: folded log holds one row per key
    assert spark.read.parquet(d).count() == 5
    # idempotent: compacting the compacted log changes nothing observable
    m2 = maintenance.compact_delta_log(spark, d, ["tok"], ["df_delta", "tf_delta"])
    assert fold() == pre and m2["files_after"] == 1


def test_compact_delta_log_membership_fold(spark, tmp_path):
    """sum_cols=[] compacts a MEMBERSHIP log (seen-ids set): fold is
    distinct, serving semi/anti-joins see identical membership."""
    from public_transit_status_with_apache_kafka_spark.operators import maintenance

    d = str(tmp_path / "seen")
    for g in range(5):
        spark.createDataFrame(
            [(i,) for i in range(g * 3, g * 3 + 5)], "doc_id long"
        ).coalesce(1).write.mode("append").parquet(d)
    pre = {r.doc_id for r in spark.read.parquet(d).distinct().collect()}
    m = maintenance.compact_delta_log(spark, d, ["doc_id"], [])
    post = {r.doc_id for r in spark.read.parquet(d).collect()}
    assert post == pre == set(range(17))
    # distinct fold: exactly one row per member now
    assert spark.read.parquet(d).count() == len(pre)
    assert m["files_after"] == 1


def test_compact_delta_log_bit_or_fold(spark, tmp_path):
    """fold='bit_or' compacts bitmap-word logs: OR-merge per (group,
    word index), distinct counts identical pre/post."""
    from public_transit_status_with_apache_kafka_spark.operators import maintenance

    d = str(tmp_path / "words")
    for g in range(4):
        spark.createDataFrame(
            [("a", w, 1 << (g * 4 + w)) for w in range(3)],
            "grp string, w_idx int, word long",
        ).coalesce(1).write.mode("append").parquet(d)

    def served():
        return {
            (r.grp, r.n)
            for r in spark.read.parquet(d)
            .groupBy("grp", "w_idx")
            .agg(F.expr("bit_or(word)").alias("word"))
            .groupBy("grp")
            .agg(F.expr("sum(bit_count(word))").cast("long").alias("n"))
            .collect()
        }

    pre = served()
    m = maintenance.compact_delta_log(
        spark, d, ["grp", "w_idx"], ["word"], fold="bit_or"
    )
    assert served() == pre == {("a", 12)}
    assert m["files_after"] == 1
    assert spark.read.parquet(d).count() == 3  # one row per (grp, w_idx)
