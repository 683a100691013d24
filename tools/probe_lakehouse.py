"""Scale probe for the lakehouse read-path family (VERDICT r9 #6) —
the one operator family with no recorded 1x/4x/16x replication probe:

- x_mvcc_time_travel (timetravel_read): the as-of merge-on-read fold
  over a version-partitioned delta log replicated in KEYS — fold
  throughput (delta rows/sec) must hold as the log grows.
- x_positional_deletes: base + positional-delete anti-join with file
  count AND rows replicated — read throughput must hold.
- x_manifest_pruning: min/max file skipping with the file count
  replicated and the range predicate FIXED — the files the reader
  opens must stay ~constant while total files grow (the manifest IS
  the scan plan; a 20-value range over range-clustered files touches
  O(range) files at any corpus size).
- x_bloom_file_skip: per-file bloom index with the file count
  replicated and the probe keys FIXED — files read stay ~|keys| plus
  a false-positive tail that the 4096-bit/3-hash sizing keeps <<1
  expected file even at 16x.
- e8_index_compaction (maintenance.compact_delta_log): generations
  replicated 8x/32x/128x — pre-compaction serve fold scales with the
  log, post-compaction serve is one generation regardless, and the
  folded rows are value-identical (count + checksum pinned here,
  row-identity pinned in tests/test_maintenance.py).

Structural mirrors of the registered plans (same folds, same joins,
same manifest/bloom harvests), parameterized by the replication factor;
the registered queries stay untouched. tests/test_lakehouse_probe.py
pins the committed record against drift.

Usage: python tools/probe_lakehouse.py [sf_dir] [out.jsonl]
Appends one JSON line per (op, factor); the committed record lives at
tools/probe_results/lakehouse_r10.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import (  # noqa: E402
    maintenance,
)
from public_transit_status_with_apache_kafka_spark.plans.lakehouse import (  # noqa: E402
    timetravel_read,
)
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

FACTORS = (1, 4, 16)
KEY_OFF = 1_000_000_000
USER_OFF = 1_000_000


def replicate(spark, df, factor: int, offsets: dict):
    """factor disjoint copies; each column in ``offsets`` shifts by
    copy * offset so copies never collide on keys."""
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    out = df.crossJoin(copies)
    for col, off in offsets.items():
        out = out.withColumn(col, F.col(col) + F.col("_copy") * off)
    return out.drop("_copy").localCheckpoint()


def probe_mvcc(spark, sf_dir: str, factor: int, tmp: str) -> dict:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    o = replicate(spark, o, factor, {"o_orderkey": KEY_OFF})
    deltas = (
        o.select(
            F.lit(0).alias("v"), F.lit("i").alias("op"),
            F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("val"),
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
    log = tmp + "/log"
    deltas.write.partitionBy("v").parquet(log)
    n_deltas = spark.read.parquet(log).filter(F.col("v") <= 1).count()
    t0 = time.time()
    n_live = timetravel_read(spark, log, as_of=1).count()
    wall = time.time() - t0
    return {
        "op": "x_mvcc_time_travel", "factor": factor,
        "n_delta_rows_scanned": n_deltas, "n_live": n_live,
        "fold_wall_sec": round(wall, 3),
        "delta_rows_per_sec": round(n_deltas / wall),
    }


def probe_posdel(spark, sf_dir: str, factor: int, tmp: str) -> dict:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    o = replicate(spark, o, factor, {"o_orderkey": KEY_OFF})
    o.repartition(4 * factor).write.parquet(tmp + "/base")
    base = spark.read.parquet(tmp + "/base").select(
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
        "o_orderkey", "o_orderpriority",
    )
    base.filter(F.col("o_orderkey") % 97 == 0).select("_file", "_pos").write.parquet(
        tmp + "/deletes"
    )
    deletes = spark.read.parquet(tmp + "/deletes")
    t0 = time.time()
    n_live = base.join(F.broadcast(deletes), ["_file", "_pos"], "anti").count()
    wall = time.time() - t0
    n_base = base.count()
    return {
        "op": "x_positional_deletes", "factor": factor,
        "n_base": n_base, "n_live": n_live,
        "n_files": maintenance.dir_stats(tmp + "/base")[0],
        "read_wall_sec": round(wall, 3),
        "base_rows_per_sec": round(n_base / wall),
    }


def probe_manifest(spark, sf_dir: str, factor: int, tmp: str) -> dict:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    ev = replicate(spark, ev, factor, {"user_id": USER_OFF})
    lo, hi = 40, 59  # fixed predicate: only copy 0 matches
    ev.repartitionByRange(8 * factor, "user_id").write.parquet(tmp + "/data")
    manifest = (
        spark.read.parquet(tmp + "/data")
        .select(F.col("_metadata.file_path").alias("path"), "user_id")
        .groupBy("path")
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    keep = [r["path"] for r in manifest if r["hi"] >= lo and r["lo"] <= hi]
    t0 = time.time()
    n = (
        spark.read.parquet(*keep)
        .filter(F.col("user_id").between(lo, hi))
        .count()
    )
    wall = time.time() - t0
    return {
        "op": "x_manifest_pruning", "factor": factor,
        "files_total": len(manifest), "files_kept": len(keep),
        "n_matched": n, "pruned_read_wall_sec": round(wall, 3),
    }


_BLOOM_M, _BLOOM_K, _BLOOM_IDS = 4096, 3, (7, 77, 149)


def probe_bloom(spark, sf_dir: str, factor: int, tmp: str) -> dict:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    ev = replicate(spark, ev, factor, {"user_id": USER_OFF})
    ev.repartition(8 * factor, "user_id").write.parquet(tmp + "/data")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col("user_id"), F.lit(s)), F.lit(_BLOOM_M))
                for s in range(1, _BLOOM_K + 1)
            ]
        )
    ).alias("pos")
    bloom_rows = (
        spark.read.parquet(tmp + "/data")
        .select(F.col("_metadata.file_path").alias("path"), "user_id")
        .select("path", pos)
        .select(
            "path",
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("path", "word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    blooms: dict[str, dict[int, int]] = {}
    for r in bloom_rows:
        blooms.setdefault(r["path"], {})[r["word"]] = r["bits"]
    probe = (
        spark.createDataFrame([(i,) for i in _BLOOM_IDS], "user_id long")
        .select("user_id", pos)
        .collect()
    )
    key_pos: dict[int, list[int]] = {}
    for r in probe:
        key_pos.setdefault(r["user_id"], []).append(r["pos"])
    keep = [
        path
        for path, words in blooms.items()
        if any(
            all(words.get(p // 64, 0) & (1 << (p % 64)) for p in positions)
            for positions in key_pos.values()
        )
    ]
    t0 = time.time()
    n = (
        spark.read.parquet(*keep)
        .filter(F.col("user_id").isin(*_BLOOM_IDS))
        .count()
    )
    wall = time.time() - t0
    return {
        "op": "x_bloom_file_skip", "factor": factor,
        "files_total": len(blooms), "files_read": len(keep),
        "n_matched": n, "pruned_read_wall_sec": round(wall, 3),
    }


def probe_compaction(spark, sf_dir: str, factor: int, tmp: str) -> dict:
    """8*factor delta generations of a keyed count log; serve = fold."""
    ev = load(spark, sf_dir, "events").select("user_id")
    per_gen = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("n")
    ).localCheckpoint()
    log = tmp + "/deltas"
    gens = 8 * factor
    for _ in range(gens):
        per_gen.write.mode("append").parquet(log)

    def serve():
        t0 = time.time()
        row = (
            spark.read.parquet(log)
            .groupBy("k")
            .agg(F.sum("n").alias("n"))
            .agg(
                F.count("*").alias("keys"),
                F.sum(F.col("n") * F.col("k")).alias("chk"),
            )
            .collect()[0]
        )
        return time.time() - t0, (row["keys"], int(row["chk"]))

    before_wall, before_val = serve()
    files_before = maintenance.dir_stats(log)[0]
    maintenance.compact_delta_log(spark, log, ["k"], ["n"])
    files_after = maintenance.dir_stats(log)[0]
    after_wall, after_val = serve()
    return {
        "op": "e8_index_compaction", "factor": factor,
        "generations": gens,
        "files_before": files_before, "files_after": files_after,
        "serve_before_sec": round(before_wall, 3),
        "serve_after_sec": round(after_wall, 3),
        "rows_match": before_val == after_val,
        "delta_rows_folded": gens * per_gen.count(),
        "fold_rows_per_sec": round(gens * per_gen.count() / before_wall),
    }


PROBES = {
    "x_mvcc_time_travel": probe_mvcc,
    "x_positional_deletes": probe_posdel,
    "x_manifest_pruning": probe_manifest,
    "x_bloom_file_skip": probe_bloom,
    "e8_index_compaction": probe_compaction,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "probe_results",
            "lakehouse_r10.jsonl",
        )
    )
    spark = get_spark("probe_lakehouse")
    spark.sparkContext.setLogLevel("ERROR")
    recs = []
    for name, fn in PROBES.items():
        for factor in FACTORS:
            tmp = tempfile.mkdtemp(prefix=f"lkprobe_{factor}_")
            try:
                rec = fn(spark, sf_dir, factor, tmp)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            recs.append(rec)
            print(json.dumps(rec), flush=True)
    with open(out_path, "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
