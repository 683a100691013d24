"""Structural invariants of the sf1.0 fixture generator
(tools/gen_sf1.py), exercised at factor 2 on sf0.001 so the properties
that make the 10x gate honest are themselves pinned:

- every copy is a SELF-CONTAINED join universe: each lineitem order key
  resolves inside its own copy, and no key resolves across copies, so
  per-key join fan-outs replicate instead of coupling;
- the key offset preserves small-modulus classes (planted mod-based
  subsets keep their per-copy membership);
- the documents token bijection keeps within-copy shingle structure
  (exact-dup groups replicate exactly) while making cross-copy shingle
  sets disjoint (no cross-copy near-dup coupling).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.io_util import load

_spec = importlib.util.spec_from_file_location(
    "gen_sf1", Path(__file__).parent.parent / "tools" / "gen_sf1.py"
)
gen_sf1 = importlib.util.module_from_spec(_spec)
sys.modules["gen_sf1"] = gen_sf1
_spec.loader.exec_module(gen_sf1)

SRC = "/root/testdata/sf0.001"


def test_copies_are_self_contained_join_universes(spark):
    orders = gen_sf1.replicate(
        load(spark, SRC, "orders"), ["o_orderkey", "o_custkey"], 2
    ).drop("_copy")
    li = gen_sf1.replicate(
        load(spark, SRC, "lineitem"),
        ["l_orderkey", "l_partkey", "l_suppkey"],
        2,
    ).drop("_copy")
    n_li = li.count()
    resolved = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).count()
    assert resolved == n_li  # every fk resolves (exactly once: pk unique)
    # and resolution is WITHIN-copy: key copy tags must agree
    cross = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_orderkey") >= gen_sf1.OFF) != (F.col("o_custkey") >= gen_sf1.OFF)
    )
    assert cross.count() == 0


def test_offset_preserves_small_modulus_classes():
    for m in range(1, 17):
        assert gen_sf1.OFF % m == 0, m
    assert gen_sf1.OFF % 20 == 0


def test_token_bijection_replicates_dup_structure(spark):
    docs = load(spark, SRC, "documents")
    rep = gen_sf1.replicate(docs, ["doc_id"], 2)
    toks = F.split(F.col("text"), " ")
    tagged = F.array_join(
        F.transform(
            toks,
            lambda t: F.concat(
                F.lit("c"), F.col("_copy").cast("string"), F.lit("_"), t
            ),
        ),
        " ",
    )
    rep = rep.withColumn("text", tagged)
    base_groups = (
        docs.groupBy(F.md5("text")).count().groupBy("count").count()
        .collect()
    )
    rep_groups = (
        rep.groupBy(F.md5("text")).count().groupBy("count").count()
        .collect()
    )
    base_hist = {r["count"]: r["count(1)"] if "count(1)" in r else r[1] for r in base_groups}
    rep_hist = {r["count"]: r[1] for r in rep_groups}
    # duplicate-group SIZE histogram replicates exactly x2 (same group
    # sizes, twice as many groups — cross-copy texts never collide)
    assert rep_hist == {k: 2 * v for k, v in base_hist.items()}
    # cross-copy token sets are disjoint: no token appears in both copies
    tok_copies = rep.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok"), "_copy"
    ).distinct()
    both = (
        tok_copies.groupBy("tok")
        .agg(F.countDistinct("_copy").alias("nc"))
        .filter(F.col("nc") > 1)
    )
    assert both.count() == 0
