"""Scale-layout techniques: salted aggregation equivalence on skewed
keys, and bucketed co-located joins (no shuffle Exchange in the plan)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.operators import skew


def test_salted_count_equals_plain_on_skew(spark):
    """90% of rows share one hot key; the salted two-phase count must
    equal the plain groupBy exactly."""
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    plain = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r["count"]) for r in skew.salted_count(df, ["k"]).collect()}
    assert salted == plain


def test_salted_sum_equals_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 100).cast("long").alias("v")
    )
    plain = {(r.k, r.s) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {(r.k, r.sum_value) for r in skew.salted_sum(df, ["k"], "v").collect()}
    assert salted == plain


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    o = spark.range(5_000).select(
        F.col("id").alias("okey"), (F.col("id") % 97).alias("v1")
    )
    li = spark.range(20_000).select(
        (F.col("id") % 5_000).alias("okey"), (F.col("id") % 13).alias("v2")
    )
    for name, df in (("b_orders", o), ("b_lineitem", li)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "okey")
            .sortBy("okey")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Both sides bucketed by the join key with equal bucket counts:
    the sort-merge join must read buckets co-located — zero Exchange
    nodes in the physical plan — and produce the same result as the
    shuffle join over the raw frames."""
    to, tl = bucketed_tables
    o, li = spark.table(to), spark.table(tl)
    joined = o.hint("merge").join(li, "okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    agg = joined.groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v1") * F.col("v2")).alias("dot")
    ).first()
    # cross-check against plain (non-bucketed) computation
    o2 = spark.range(5_000).select(F.col("id").alias("okey"), (F.col("id") % 97).alias("v1"))
    li2 = spark.range(20_000).select((F.col("id") % 5_000).alias("okey"), (F.col("id") % 13).alias("v2"))
    exp = o2.join(li2, "okey").groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v1") * F.col("v2")).alias("dot")
    ).first()
    assert (agg.n, agg.dot) == (exp.n, exp.dot)


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    """Hive-style partitionBy layout: a filter on the partition column
    must prune at the FILE level — PartitionFilters in the scan, only
    the matching lang= directories read, and zero rows from other
    partitions ever scanned."""
    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias("lang"),
        (F.col("id") * 7 % 100).alias("n_chars"),
    )
    path = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)

    back = spark.read.parquet(path).filter(F.col("lang") == "l3")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = back._jdf.queryExecution().explainString(mode)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l3" in m.group(1), plan[:1500]
    # correctness: exactly the l3 partition's rows come back
    assert back.count() == 400
    assert {r.lang for r in back.select("lang").distinct().collect()} == {"l3"}
    # layout: one directory per lang value on disk
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert dirs == {f"lang=l{i}" for i in range(5)}


def test_orc_roundtrip_pushes_filter_to_scan(spark, tmp_path):
    """s1_orc_roundtrip's claim: ORC scans take pushdown predicates
    exactly like parquet (stripe statistics), so the lang filter must
    appear in PushedFilters — not as a post-scan Filter only."""
    docs = spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        (F.col("id") * 11 % 97).alias("n_chars"),
    )
    path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).filter(F.col("lang") == "l1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = back._jdf.queryExecution().explainString(mode)
    import re

    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan[:1500]
    assert back.count() == 333


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime (AQE-era) bloom-filter join pruning: a selective filter
    on the dim side must inject a bloom_filter_agg subquery whose
    might_contain() guards the FACT scan — rows that cannot join are
    dropped before the shuffle. At 100 TB the default thresholds
    (creation side <= 10 MB, application scan >= 10 GB) fire naturally;
    the test lowers the application threshold because the local fixture
    is small. This is the mechanism that replaces hand-written semi-join
    pre-filters for big⋈filtered-dim joins when the dim outgrows
    broadcast."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(500_000).select(
        F.col("id"), (F.col("id") % 50_000).alias("k")
    ).write.parquet(fact_p)
    spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
    ).write.parquet(dim_p)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("cat") == 3)
        j = fact.join(dim, "k")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan
        # and the result is still exact
        exact = 10 * len([k for k in range(50_000) if k % 7 == 3])
        assert j.count() == exact
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_app,
        )


def test_parquet_aggregate_pushdown_serves_from_footers(spark, tmp_path):
    """Metadata-only aggregation: COUNT/MIN/MAX over a parquet table can
    be answered from row-group footers without scanning a single data
    page (`PushedAggregation` in the v2 scan). At 100 TB this turns a
    full-table profile query into an O(files) metadata pass. Spark
    routes parquet through the v1 source by default — the capability
    needs the v2 path (`useV1SourceList` excluding parquet), which is
    why x_table_profile keeps the one-scan v1 shape as its default and
    this contract pins the v2 alternative."""
    path = str(tmp_path / "t")
    spark.range(100_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    ).write.parquet(path)
    old_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(path).agg(
            F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx")
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "PushedAggregation: [COUNT(*), MIN(v), MAX(v)]" in plan, plan[:2000]
        assert df.first() == (100_000, 0, 96)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old_agg)
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
