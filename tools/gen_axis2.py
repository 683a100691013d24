"""Second scale axis (VERDICT r11 #6): the sf1.0 fixture replicates
rows under a per-copy token BIJECTION for documents (cross-copy shingle
sets disjoint = vocabulary GROWS with the corpus) but leaves part names
untouched (vocabulary STATIONARY = blocks densify, pairs quadratic).
Each pair-based family therefore saw only ONE scaling axis in round 11:

- x_fuzzy_name_match (part names): densification only — the 37x riser.
- the document pair families (prefix/containment/SNM/LSH): vocabulary
  growth only — everything scaled a clean 10x.

This generator materializes the COMPLEMENTARY axis for both at FACTOR x
(default 4) so SCALE_SF1 can report each family under both regimes:

- part: keys offset per copy AND p_name rewritten by a per-copy
  consonant/vowel rotation (distinct combos through lcm(20,5)=20
  copies) — the part-name vocabulary now grows with the corpus, so
  first-two-word blocks stay at sf0.1 density and fuzzy-match DP pairs
  should grow ~FACTOR x, not FACTOR^2 x.
- documents: keys offset per copy, text byte-identical across copies —
  worst-case densification for the shingle families: every doc gains
  FACTOR-1 exact twins, shingle df multiplies by FACTOR, and the
  blocking caps (the df cap, the LSH max_bucket cap) are the load-
  bearing defense the probe measures engaging.

Usage: python tools/gen_axis2.py [out_dir] [factor] [src_dir]
Defaults: scale_fixtures/axis2 4 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

OFF = 720_720 * 1000  # gen_sf1's modulus-preserving key offset

CONS = "bcdfghjklmnpqrstvwxz"
VOWS = "aeiou"


def rotation(c: int) -> tuple[str, str]:
    """Per-copy letter substitution: rotate consonants and vowels
    independently (the probe_prefix_filter salted-replicate scheme) —
    word shapes and lengths survive, vocabulary diverges per copy."""
    ci, vi = c % len(CONS), c % len(VOWS)
    return CONS + VOWS, CONS[ci:] + CONS[:ci] + VOWS[vi:] + VOWS[:vi]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "scale_fixtures/axis2"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("gen_axis2")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    part = load(spark, src, "part")
    copies = []
    for c in range(factor):
        s, d = rotation(c)
        copies.append(
            part.withColumn("p_partkey", F.col("p_partkey") + F.lit(c * OFF))
            .withColumn("p_name", F.translate(F.lower(F.col("p_name")), s, d))
        )
    vocab_part = copies[0]
    for cp in copies[1:]:
        vocab_part = vocab_part.unionByName(cp)
    vocab_part.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "part.parquet")
    )

    docs = load(spark, src, "documents")
    dcopies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * OFF))
        for c in range(factor)
    ]
    dense_docs = dcopies[0]
    for cp in dcopies[1:]:
        dense_docs = dense_docs.unionByName(cp)
    dense_docs.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    n_p = spark.read.parquet(os.path.join(out, "part.parquet")).count()
    n_d = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    print(
        f"axis2 fixture at {out}: part={n_p} rows (vocab-grown x{factor}), "
        f"documents={n_d} rows (densified x{factor}) in {time.time()-t0:.1f}s"
    )


if __name__ == "__main__":
    main()
