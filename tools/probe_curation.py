"""Scale probe for the text-curation capstone (round 9): replicate the
sf0.1 documents corpus Nx with fresh doc ids but IDENTICAL text — the
adversarial shape for a curation pipeline, since every replica is an
exact/near duplicate — and run e7_text_curation_pipeline's composed
chain end to end at each factor.

What the record shows:

  - wall time vs input rows (the chain is dominated by the MinHash/LSH
    near-dup stage; hot-bucket caps keep the pair expansion bounded);
  - the FINAL kept-set stays ~corpus-sized at every factor: the
    near-dup stage absorbs the replication (keep = component min), so
    16x dirty input converges to the same curated pool — the behavior
    that makes the chain safe to point at a crawl with massive
    duplication.

Usage: python tools/probe_curation.py [sf_dir] [max_factor]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.plans.llm_data import (  # noqa: E402
    _curation_pipeline,
)
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402


def replicate(docs, factor: int):
    out = docs
    copies = 1
    while copies < factor:
        out = out.unionByName(
            out.withColumn("doc_id", F.col("doc_id") + F.lit(100_000_000 * copies))
        )
        copies *= 2
    return out.localCheckpoint()  # pin: measure the pipeline, not the union


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("probe_curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")

    factor = 1
    while factor <= max_factor:
        d = replicate(docs, factor)
        n_in = d.count()
        t0 = time.time()
        rows = _curation_pipeline(spark, d).collect()
        wall = time.time() - t0
        stages = {r["stage_name"]: r["n_docs"] for r in rows if r["stage"] <= 6}
        print(json.dumps({
            "op": "e7_text_curation_pipeline",
            "factor": factor,
            "rows_in": n_in,
            "wall_sec": round(wall, 3),
            "rows_per_sec": int(n_in / wall),
            "pool": stages.get("pool"),
            "after_url_dedup": stages.get("url_dedup"),
            "after_neardup": stages.get("neardup_dedup"),
            "final_kept": stages.get("quality_gate"),
        }))
        factor *= 4


if __name__ == "__main__":
    main()
