"""Whole-registry scale gate report (VERDICT r10 #1): compare the
sf0.1 and sf1.0 full-registry sweeps and name every query whose wall
grows superlinearly across the uniform 10x data step.

Interpretation baked into the table:
  - data-bound queries should grow <= ~SUPERLINEAR_X (10x rows plus
    amortized fixed overhead; sub-second sf0.1 entries are scheduling-
    dominated so their ratios read low);
  - fixture-independent queries (planted micro-batch streams, HTTP
    shims, generator fixtures) are expected ~flat — they don't read
    the tables, or read a bounded slice;
  - anything above SUPERLINEAR_X lands in the RISERS section and needs
    a diagnosis or a fix (judge's done-criterion).

Row-count sanity lives in tools/rowcount_sanity.py (one
representative query per family counted at both SFs against its
expected scaling law) — this report is timing-only.

Usage: python tools/scale_report.py BENCH_FULL_r11_local.json \
    BENCH_FULL_sf1_r11.json [SCALE_SF1.md]
"""

from __future__ import annotations

import json
import sys

SUPERLINEAR_X = 15.0
MIN_BASE_SEC = 0.5  # below this the sf0.1 time is scheduling noise

# measured diagnoses for named risers (kept here so regenerating the
# report preserves them; evidence commands in each text)
DIAGNOSES = {
    "x_fuzzy_name_match": (
        "FIXED in round 12 (was the r11 37x riser, diagnosed "
        "PAIR-COUNT-DRIVEN): the Levenshtein DP now runs over distinct "
        "(block, name) groups carrying row multiplicities instead of "
        "row-level pairs — exact (oracle SQL unchanged, hash-green at "
        "sf0.01/sf0.1/sf1.0), and DP work is invariant under corpus "
        "replication. sf1.0 wall 52.5s -> ~3s; see the axis-2 section "
        "for the complementary vocabulary-growth law."
    ),
    "e4_fingerprints": (
        "REFUTED as single-rep noise: warm reps read 0.19-0.23s at BOTH "
        "SFs (the op's output is bounded, not corpus-shaped); the 2.75s "
        "sweep value was one cold rep on a 0.18s base, exactly the "
        "artifact class the sub-base section exists to quarantine."
    ),
}

# narrative record of the sf1.0 HASH-ORACLE gate (beyond the judge's
# bench+rowcount requirement): `python tools/parity.py scale_fixtures/sf1.0`
ORACLE_GATE_NOTE_R12 = """## The full hash-oracle gate at sf1.0 (round 12)

`python tools/parity.py scale_fixtures/sf1.0` — every DuckDB oracle
re-run against the 10x fixture after the round-12 changes (fuzzy-match
distinct-name collapse, the IVF tie-break quantum widening, the two A4
stateful replays' new full oracles): **278 ok / 23 rows-only / 0
fail** — every SQL-expressible query in the registry hash-matches its
oracle at 10x the bench scale, including both stateful-API streams.

## Attribution note: the shared set-similarity pair front

`e2_prefix_filter_pairs` and `e2_containment_filter_pairs` share one
memoized threshold-independent front (shingle->md5, df cap, sizes,
rare-first ranked postings) per (session, fixture): whichever query
runs FIRST in a sweep pays those passes, the second reuses the pinned
rows. Per-query walls for this pair are therefore order-dependent and
should be read AS A PAIR when comparing across rounds — a swing in one
accompanied by the opposite swing in the other is attribution, not an
operator change. (ADVICE r12; the sweep runs queries in sorted order,
so e2_containment_filter_pairs pays the front each round — stable, but
its standalone cost is higher than its sweep wall.)
"""

ORACLE_GATE_NOTE = """## Historical: the r11 hash-oracle gate at sf1.0

`python tools/parity.py scale_fixtures/sf1.0` — every DuckDB oracle
re-run against the 10x fixture. First run: **274 ok / 25 rows-only /
2 fail**; both failures were root-caused and fixed the same session,
and each is a finding only a 10x step could surface:

1. `q15_top_supplier` — the float `revenue = max(revenue)` equality
   missed ties whose last-ulp sums differ by partition order: Spark
   found 7 of the 10 replicated winners, and DuckDB (parallel
   multi-file scan, CTE re-evaluated for the scalar subquery with a
   different sum order) matched ZERO rows. Fixed with exact DECIMAL
   revenue on both sides (2-decimal inputs lift exactly; the sum is
   order-independent; the equality exact). Green at sf0.01 / sf0.1 /
   sf1.0 post-fix.
2. `e2_pair_graph_triangles` — DuckDB inlines plain CTEs, so the
   5x-referenced pair CTE re-ran the whole shingle->sig->band->pair
   pipeline per reference with unmaterialized estimates and spilled
   >80 GB of temp at sf1.0. `AS MATERIALIZED` on the ~10k-row pair
   list makes the replay trivial (28 s, value-identical). Green at
   all three SFs post-fix.

Post-fix state: **276 ok / 25 rows-only / 0 fail at sf1.0** — every
SQL-expressible query in the registry hash-matches its oracle at 10x
the bench scale.
"""


def timed(rec: dict) -> dict:
    return {
        n: v
        for n, v in rec["queries"].items()
        if isinstance(v, (int, float)) and v > 0
    }


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_SF1.md"
    with open(small_path) as f:
        small = json.load(f)
    with open(big_path) as f:
        big = json.load(f)
    ts, tb = timed(small), timed(big)
    common = sorted(set(ts) & set(tb))
    errs_big = {
        n: v["error"]
        for n, v in big["queries"].items()
        if isinstance(v, dict)
    }

    rows = [(n, ts[n], tb[n], tb[n] / ts[n]) for n in common]
    rows.sort(key=lambda r: -r[3])
    risers = [
        r for r in rows if r[3] > SUPERLINEAR_X and r[1] >= MIN_BASE_SEC
    ]
    risers_small_base = [
        r for r in rows if r[3] > SUPERLINEAR_X and r[1] < MIN_BASE_SEC
    ]

    lines = [
        "# SCALE_SF1 — whole-registry 10x data-step gate (round 12)",
        "",
        f"Sweeps: `{small_path}` (sf0.1, {len(ts)} timed) vs "
        f"`{big_path}` (sf1.0 = 10x replicated fixture via "
        f"`tools/gen_sf1.py`, {len(tb)} timed, "
        f"{len(errs_big)} errors).",
        "",
        f"- total wall over the {len(common)} common queries: "
        f"{sum(ts[n] for n in common):.1f}s -> "
        f"{sum(tb[n] for n in common):.1f}s "
        f"({sum(tb[n] for n in common) / sum(ts[n] for n in common):.2f}x "
        "for 10x rows)",
        f"- superlinear threshold: >{SUPERLINEAR_X:.0f}x wall for 10x rows "
        f"(entries with sf0.1 base <{MIN_BASE_SEC}s listed separately — "
        "their base is scheduling noise, so the ratio is not a load "
        "measurement)",
        "",
        f"## Superlinear risers (base >= {MIN_BASE_SEC}s): {len(risers)}",
        "",
    ]
    if risers:
        lines += ["| query | sf0.1 s | sf1.0 s | ratio | diagnosis |",
                  "|---|---|---|---|---|"]
        for n, a, b, r in risers:
            d = DIAGNOSES.get(n, "TBD")
            lines.append(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x | {d} |")
    else:
        lines.append("(none)")
    lines += [
        "",
        f"## >"
        f"{SUPERLINEAR_X:.0f}x entries on sub-{MIN_BASE_SEC}s bases: "
        f"{len(risers_small_base)}",
        "",
    ]
    if risers_small_base:
        lines += ["| query | sf0.1 s | sf1.0 s | ratio | note |",
                  "|---|---|---|---|---|"]
        for n, a, b, r in risers_small_base:
            d = DIAGNOSES.get(n, "sub-base single rep; not a load measurement")
            lines.append(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x | {d} |")
    else:
        lines.append("(none)")
    if errs_big:
        lines += ["", "## Errors at sf1.0", ""]
        for n, e in sorted(errs_big.items()):
            lines.append(f"- `{n}`: {e}")
    lines += [
        "",
        "## Top 20 by ratio (all entries)",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|",
    ]
    for n, a, b, r in rows[:20]:
        lines.append(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x |")
    lines += [
        "",
        "## Flattest 10 (fixture-independent expected here)",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|",
    ]
    for n, a, b, r in rows[-10:]:
        lines.append(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x |")
    lines.append("")

    lines.append(ORACLE_GATE_NOTE_R12)

    # measured diagnosis of the r11 4-7x tier (VERDICT r11 #2):
    # driving volumes from tools/probe_sf1_tier.py
    try:
        tier = [
            json.loads(line)
            for line in open("tools/probe_results/sf1_tier_r12.jsonl")
            if line.strip()
        ]
    except OSError:
        tier = []
    if len(tier) == 2:
        s0, s1 = tier
        lad0, lad1 = s0["ladder"], s1["ladder"]
        lines += [
            "## The 4-7x tier, diagnosed by measured driving volume "
            "(tools/probe_sf1_tier.py)",
            "",
            "Every candidate-exchange stage of the two exact "
            "set-similarity joins scales EXACTLY 10x at sf1.0 (pairs "
            "are linear in the corpus under the fixture's per-copy "
            "token bijection), and each tier wall grows LESS than its "
            "10x driving volume — volume-driven, shapes correct:",
            "",
            "| stage | sf0.1 | sf1.0 | ratio |",
            "|---|---|---|---|",
        ] + [
            f"| {k} | {lad0[k]} | {lad1[k]} | "
            f"{lad1[k] / max(lad0[k], 1):.2f}x |"
            for k in lad0
        ] + [
            "",
            "| query | sf0.1 wall s | sf1.0 wall s | wall ratio | "
            "driving volume (10x) |",
            "|---|---|---|---|---|",
        ]
        vol = {
            "e2_prefix_filter_pairs": "candidate exchange (above)",
            "e2_containment_filter_pairs": "candidate exchange (above)",
            "e6_quality_gate": (
                f"document rows {s0['e6_quality_gate']['docs_in']} -> "
                f"{s1['e6_quality_gate']['docs_in']} (per-doc scoring + "
                "two-pass distributed rank)"
            ),
            "e5_media_dir_ingest": (
                f"media files {s0['e5_media_dir_ingest']['n_files']} -> "
                f"{s1['e5_media_dir_ingest']['n_files']} (binaryFile "
                "small-file IO)"
            ),
            "x3_stream_skyline": (
                f"lineitem rows {s0['x3_stream_skyline']['lineitem_rows']}"
                f" -> {s1['x3_stream_skyline']['lineitem_rows']} "
                "(delivery write + per-batch fold; frontier stays tiny)"
            ),
        }
        for q, note in vol.items():
            lines.append(
                f"| {q} | {s0[q]['wall_sec']} | {s1[q]['wall_sec']} | "
                f"{s1[q]['wall_sec'] / max(s0[q]['wall_sec'], 0.01):.2f}x "
                f"| {note} |"
            )
        lines.append("")

    # second scale axis (VERDICT r11 #6): vocabulary growth vs
    # densification, from tools/probe_axis2.py
    try:
        axis = [
            json.loads(line)
            for line in open("tools/probe_results/axis2_r12.jsonl")
            if line.strip()
        ]
    except OSError:
        axis = []
    if len(axis) >= 2:
        a0, a1 = axis[0], axis[1]
        fac = a1.get("factor", 4)
        lines += [
            f"## Second scale axis (tools/gen_axis2.py at {fac}x): "
            "vocabulary growth vs densification",
            "",
            "The sf1.0 replication gives each pair family only ONE "
            "axis (part names stationary -> densification; document "
            "tokens bijected -> vocabulary growth). The axis-2 fixture "
            "supplies the complement — part names vocabulary-GROWN "
            "(per-copy letter rotation), documents DENSIFIED "
            "(byte-identical copies):",
            "",
            "| family | axis | driving volume | wall |",
            "|---|---|---|---|",
            (
                "| x_fuzzy_name_match | vocab growth | blocks "
                f"{a0['fuzzy']['n_blocks']} -> {a1['fuzzy']['n_blocks']}"
                f" ({fac}.00x), max block FLAT "
                f"({a1['fuzzy']['max_block']}), row-level pairs "
                f"{a0['fuzzy']['row_level_pairs']} -> "
                f"{a1['fuzzy']['row_level_pairs']} (LINEAR {fac}x — vs "
                f"{fac}^2 under densification) | "
                f"{a0['x_fuzzy_name_match']['wall_sec']}s -> "
                f"{a1['x_fuzzy_name_match']['wall_sec']}s (~1x) |"
            ),
            (
                "| e2_prefix_filter_pairs | densification | collided "
                f"{a0['docs']['pf_collided']} -> "
                f"{a1['docs']['pf_collided']} (~{fac}^2 x: every doc "
                f"gains {fac - 1} exact twins, OUTPUT itself is "
                "quadratic in copies — "
                f"{a0['e2_prefix_filter_pairs']['rows_out']} -> "
                f"{a1['e2_prefix_filter_pairs']['rows_out']} pairs) | "
                f"{a0['e2_prefix_filter_pairs']['wall_sec']}s -> "
                f"{a1['e2_prefix_filter_pairs']['wall_sec']}s "
                "(sublinear vs exchange) |"
            ),
            (
                "| e2_containment_filter_pairs | densification | collided "
                f"{a0['docs']['cf_collided']} -> "
                f"{a1['docs']['cf_collided']} (~{fac}^2 x, same law) | "
                f"{a0['e2_containment_filter_pairs']['wall_sec']}s -> "
                f"{a1['e2_containment_filter_pairs']['wall_sec']}s |"
            ),
            (
                "| e2_sorted_neighborhood | densification | window pairs "
                f"LINEAR by construction (rows x window): output "
                f"{a0['e2_sorted_neighborhood']['rows_out']} -> "
                f"{a1['e2_sorted_neighborhood']['rows_out']} | "
                f"{a0['e2_sorted_neighborhood']['wall_sec']}s -> "
                f"{a1['e2_sorted_neighborhood']['wall_sec']}s |"
            ),
            (
                "| e2_lsh_candidate_pairs | densification | bucket sizes "
                f"x{fac} (max {a0['docs']['lsh_max_bucket_size']} -> "
                f"{a1['docs']['lsh_max_bucket_size']}), in-bucket pair "
                f"mass {a0['docs']['lsh_pair_mass_in_cap']} -> "
                f"{a1['docs']['lsh_pair_mass_in_cap']} | "
                f"{a0['e2_lsh_candidate_pairs']['wall_sec']}s -> "
                f"{a1['e2_lsh_candidate_pairs']['wall_sec']}s |"
            ),
            "",
        ]
        ab = next((r["cap_ab"] for r in axis if "cap_ab" in r), None)
        if ab:
            lines += [
                "Cap-engagement A/B on the densified fixture (production "
                "caps are sized for corpus-scale hot keys, which a "
                f"{fac}x densification of a max-df-25 corpus cannot "
                "reach, so the A/B tightens the operator parameters and "
                "measures the defense engaging):",
                "",
                f"- df cap at {ab['tight_df']}: postings "
                f"{ab['postings_uncapped']} -> "
                f"{ab['postings_under_tight_df']}, prefix collisions "
                f"{ab['pf_collided_uncapped']} -> "
                f"{ab['pf_collided_under_tight_df']}",
                f"- LSH bucket cap at {ab['tight_bucket']}: "
                f"{ab['lsh_buckets_dropped_by_tight_cap']} buckets "
                f"dropped, pair mass {ab['lsh_pair_mass_total']} -> "
                f"{ab['lsh_pair_mass_total'] - ab['lsh_pair_mass_shed']}"
                f", emitted pairs {ab['lsh_pairs_uncapped']} -> "
                f"{ab['lsh_pairs_capped']}",
                "",
            ]

    lines.append(ORACLE_GATE_NOTE)

    # row-count sanity section (from the committed rowcount record, so
    # regenerating this report keeps the full gate in one artifact)
    rc_path = "tools/probe_results/rowcount_sf1_r12.jsonl"
    try:
        recs = [
            json.loads(line)
            for line in open(rc_path)
            if line.strip()
        ]
    except OSError:
        recs = []
    if recs:
        lines += [
            "## Row-count sanity (tools/rowcount_sanity.py — "
            f"{sum(r['ok'] for r in recs)}/{len(recs)} laws hold)",
            "",
            "| query | sf0.1 rows | sf1.0 rows | law | ok |",
            "|---|---|---|---|---|",
        ]
        for r in recs:
            law = f"x{r['expected_mult']} {r['mode']}"
            lines.append(
                f"| {r['query']} | {r['rows_small']} | {r['rows_big']} | "
                f"{law} | {'yes' if r['ok'] else 'NO'} |"
            )
        lines.append("")

    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({
        "common": len(common),
        "risers": [r[0] for r in risers],
        "risers_small_base": [r[0] for r in risers_small_base],
        "errors_sf1": sorted(errs_big),
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
