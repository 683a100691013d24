"""Scale probe for e2_prefix_filter_pairs (round-7 item #2): record the
CANDIDATE-EXCHANGE size — the thing prefix filtering exists to bound —
against corpus size, not just wall time.

Two experiments:

1. **Salted replicate** (the honest linear-work fixture from
   tools/scale_probe.py: each copy's planted near-dups stay intact,
   cross-copy similarity collapses) at 1x/4x/16x/64x. Per factor:
   docs, postings after the df cap, prefix postings (rows entering the
   self-join), exchanged pairs (pre-distinct join output — the shuffle
   that degrades when prefixes lose selectivity), distinct candidates,
   final pairs, and end-to-end seconds. Linear-or-better growth of
   `exchanged` in `docs` is the evidence the SSJoin shape holds at the
   design point.

2. **Mid-frequency adversarial fixture** (the published SSJoin worst
   case): every token at df ~ 100 — too common to be selective, too
   rare for the df cap naively sized. Rare-first ordering has nothing
   rare to pick, so the exchange approaches sum_t C(df_prefix(t), 2).
   A/B the `max_df` cap: capped vs uncapped exchanged-pair counts and
   the arithmetic bound exchanged <= prefix_rows * (max_df - 1) / 2
   that the cap restores (each surviving token has df <= max_df).

Usage: python tools/probe_prefix_filter.py [sf_dir] [max_factor]
Prints one JSON line per measurement; paste the table into README and
keep the asserted bounds in tests/test_dedup_skew.py.
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


def salted_replicate(d, factor: int):
    """Replicate with per-copy character rotations so qualifying pairs
    (the honest work) grow linearly, not quadratically. TWO independent
    rotations — 16 consonants x 5 vowels = 80 distinct combos
    (lcm(16,5)) — because a single 8-char rotation wraps at factor 8:
    copies c and c+8 become byte-identical and cross-copy duplicate
    pairs grow quadratically again (measured: 16x probe pairs jumped
    47x before this fix). Every copy differs from every other in at
    least one rotation through factor 80."""
    cons, vows = "tnshrdlcmfgpwbvk", "aeiou"
    parts = []
    for c in range(factor):
        ci, vi = c % len(cons), c % len(vows)
        rot = cons[ci:] + cons[:ci] + vows[vi:] + vows[:vi]
        parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(100_000_000 * c))
            .withColumn("text", F.translate(F.lower("text"), cons + vows, rot))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def exchange_counts(shingled, threshold_pct=40, max_df=1000):
    """Counts of every stage of the prefix-filter plan, from the SAME
    frames the operator uses (dedup.prefix_filter_stages)."""
    st = dedup.prefix_filter_stages(shingled, threshold_pct, max_df)
    prefix = st["prefix"]
    pa = prefix.select(F.col("id").alias("id_a"), "sh")
    pb = prefix.select(F.col("id").alias("id_b"), "sh")
    exchanged = pa.join(pb, "sh").filter(F.col("id_a") < F.col("id_b")).count()
    return {
        "postings": st["shingled"].count(),
        "prefix_rows": prefix.count(),
        "exchanged": exchanged,
        "collided_rows": st["collided"].count(),
        # round 9: the per-ROW positional bound prunes the rows
        # entering the min_by PARTIAL aggregate (shuffle bytes are
        # already pair-collapsed; the cut is map-side hash-update work)
        "bounded_rows": st["collided_bounded"].count(),
        "cand": st["cand"].count(),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("probe_prefix_filter")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    factor = 1
    while factor <= max_factor:
        big = salted_replicate(docs, factor)
        n = big.count()
        sh = dedup.shingle_hashes_arrow(big, "text", "doc_id", k=3).localCheckpoint()
        rec = {"probe": "salted", "factor": factor, "docs": n}
        rec.update(exchange_counts(sh))
        print(json.dumps(rec), flush=True)  # counts first: they are the bound
        timing = {"probe": "salted_timing", "factor": factor, "docs": n}
        try:
            t0 = time.time()
            dedup.prefix_filter_pairs(sh, threshold_pct=40).write.mode(
                "overwrite"
            ).format("noop").save()
            timing["pairs_sec"] = round(time.time() - t0, 2)
            timing["pairs"] = dedup.prefix_filter_pairs(sh, threshold_pct=40).count()
        except Exception as e:  # noqa: BLE001 — record, keep probing
            timing["error"] = str(e).split("\n")[0][:200]
        print(json.dumps(timing), flush=True)
        factor *= 4

    # ---- adversarial mid-frequency fixture -------------------------------
    # V tokens, every doc m of them, df ~ n_docs*m/V: nothing is rare,
    # nothing exceeds a naive cap — the prefix keeps ~60% of postings
    # and the exchange approaches sum_t C(df_prefix, 2).
    n_docs, m, vocab = 1000, 20, 200
    adv = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("id"),
            F.explode(
                F.expr(f"transform(sequence(0, {m - 1}), "
                       f"j -> (id * 37 + j * 13) % {vocab})")
            ).alias("tok"),
        )
        .distinct()
        .select("id", F.xxhash64(F.col("tok").cast("string")).alias("sh"))
        .localCheckpoint()
    )
    for cap in (None, 50, 200):
        st = exchange_counts(adv, threshold_pct=40, max_df=cap)
        rec = {"probe": "adversarial_mid_df", "max_df": cap,
               "docs": n_docs, "vocab": vocab, **st}
        if cap is not None:
            rec["cap_bound"] = st["prefix_rows"] * (cap - 1) // 2
            rec["bound_holds"] = st["exchanged"] <= rec["cap_bound"]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
