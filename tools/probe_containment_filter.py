"""Scale probe for e2_containment_filter_pairs (round 9, VERDICT r8
#5): record how many verification candidates the min-size prefix
filter + PPJoin positional bound remove, against corpus size.

Per salted-replicate factor (1x/4x/16x — same honest linear-work
fixture as tools/probe_prefix_filter.py):

- postings      rows after the df cap
- cooccur_pairs distinct co-occurring pairs (what the UNfiltered
                pair_overlap skeleton would verify — the baseline)
- collided      distinct pairs surviving the min-side PREFIX filter
                (pre-positional-bound)
- cand          pairs surviving the positional bound (what actually
                enters the verification joins)
- pairs         final verified max-containment >= pct pairs
- pruned_pct    1 - cand/collided: the positional bound's cut
- sec           end-to-end operator wall

Losslessness is pinned separately by the DuckDB oracle (brute-force
thresholded join) and tests/test_dedup_properties.py; this probe is
the SIZE evidence. Results: tools/probe_results/containment_filter_r09.jsonl

Usage: python tools/probe_containment_filter.py [sf_dir] [max_factor]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import dedup  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

from probe_prefix_filter import salted_replicate  # noqa: E402

PCT = 60
MAX_DF = 1000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("probe_containment_filter")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    factor = 1
    while factor <= max_factor:
        big = salted_replicate(docs, factor)
        n = big.count()
        sh = dedup.shingle_hashes_arrow(big, "text", "doc_id", k=3).localCheckpoint()
        st = dedup.containment_prefix_stages(sh, PCT, MAX_DF)
        cooccur = (
            st["shingled"].alias("l")
            .join(st["shingled"].alias("r"),
                  (F.col("l.sh") == F.col("r.sh")) & (F.col("l.id") < F.col("r.id")))
            .select("l.id", "r.id").distinct().count()
        )
        collided = st["collided"].select("id_s", "id_l").distinct().count()
        collided_rows = st["collided"].count()
        bounded_rows = st["collided_bounded"].count()  # r9 row-level bound
        cand = st["cand"].count()
        t0 = time.time()
        pairs = dedup.containment_prefix_pairs(sh, PCT, MAX_DF)
        pairs.write.mode("overwrite").format("noop").save()
        sec = round(time.time() - t0, 2)
        rec = {
            "probe": "containment_filter",
            "factor": factor,
            "docs": n,
            "postings": st["shingled"].count(),
            "cooccur_pairs": cooccur,
            "collided": collided,
            "collided_rows": collided_rows,
            "bounded_rows": bounded_rows,
            "cand": cand,
            "pairs": pairs.count(),
            "pruned_pct": round(100 * (1 - cand / max(collided, 1)), 1),
            "vs_naive_pct": round(100 * (1 - cand / max(cooccur, 1)), 1),
            "sec": sec,
        }
        print(json.dumps(rec), flush=True)
        factor *= 4


if __name__ == "__main__":
    main()
