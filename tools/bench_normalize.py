"""Cross-round bench report, host-normalized by an IN-SWEEP reference
query set (VERDICT r9 #1 — replaces the calib_sec hash-job normalizer).

Why the change: ``calib_sec`` (a single-stage CPU hash burst) proved
frequency-unstable on this host — r9's BENCH_DETAIL recorded 10
interleaved samples spanning 0.18–0.48 s (107% spread), and the r8→r9
pair simultaneously showed a phantom 22% headline regression and a real
30% sweep improvement with nothing in the artifacts to arbitrate.

The replacement: for every consecutive round pair, the HOST-SPEED
factor is the median per-query time ratio over the most stable
sub-second queries common to both rounds (sub-second queries are
dominated by fixed scheduler/JVM overhead, so their ratio tracks the
host, not the code; the median is robust to the minority that genuinely
changed). The CODE signal for the pair is then

    code_ratio = (sum_b / sum_a over common queries) / host_factor

with the factor's IQR recorded so a reader can see when the host was
too unstable to normalize at all. ``calib_sec`` is kept as context only.

Usage: python tools/bench_normalize.py [repo_dir]  (writes
BENCH_NORMALIZED.md and prints the summary table)
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import statistics
import sys


def parse_round(path: str) -> dict | None:
    """Extract the bench JSON line from a driver BENCH_r{N}.json record
    (the line lives, possibly progress-bar-prefixed, in its 'tail')."""
    with open(path) as f:
        rec = json.load(f)
    tail = rec.get("tail", "")
    start = tail.rfind('{"metric"')
    if start < 0:
        return None
    try:
        data = json.loads(tail[start:].strip().splitlines()[0])
    except json.JSONDecodeError:
        depth, end = 0, None
        for i, ch in enumerate(tail[start:], start):
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        if end is None:
            return None
        try:
            data = json.loads(tail[start:end])
        except json.JSONDecodeError:
            return None
    data["round"] = rec.get("n")
    return data


def _timed(queries: dict) -> dict:
    """Numeric entries only (sweeps record {'error': ...} for failures)."""
    return {
        n: v for n, v in queries.items() if isinstance(v, (int, float)) and v > 0
    }


def host_factor(a_q: dict, b_q: dict, cap: int = 40) -> dict | None:
    """Host-speed factor between two rounds: the median b/a time ratio
    over the ``cap`` most stable sub-second reference queries common to
    both (stable = ratio closest to the pool median — the trimmed set
    excludes queries whose code actually changed). Returns factor, the
    selected set's IQR (as % of the median), and pool sizes; None when
    fewer than 10 sub-second queries are shared."""
    a_t, b_t = _timed(a_q), _timed(b_q)
    pool = [
        n for n in a_t
        if n in b_t and a_t[n] < 1.0 and b_t[n] < 1.0
    ]
    if len(pool) < 10:
        return None
    ratios = [(b_t[n] / a_t[n], n) for n in pool]
    med0 = statistics.median(r for r, _ in ratios)
    sel = sorted(ratios, key=lambda rn: abs(math.log(rn[0] / med0)))[:cap]
    rs = sorted(r for r, _ in sel)
    med = statistics.median(rs)
    q1 = rs[len(rs) // 4]
    q3 = rs[(3 * len(rs)) // 4]
    full_q1 = sorted(r for r, _ in ratios)[len(ratios) // 4]
    full_q3 = sorted(r for r, _ in ratios)[(3 * len(ratios)) // 4]
    return {
        "factor": med,
        "iqr_pct": 100.0 * (q3 - q1) / med,
        "pool_iqr_pct": 100.0 * (full_q3 - full_q1) / med,
        "n": len(rs),
        "n_pool": len(pool),
    }


def pair_line(label: str, a: dict, b: dict) -> list[str]:
    """One cross-round comparison: raw ratio, host factor, code ratio."""
    a_t, b_t = _timed(a["queries"]), _timed(b["queries"])
    common = sorted(set(a_t) & set(b_t))
    if not common:
        return []
    ta = sum(a_t[n] for n in common)
    tb = sum(b_t[n] for n in common)
    raw = tb / ta
    hf = host_factor(a["queries"], b["queries"])
    if hf is None:
        return [
            f"- {label}: {len(common)} common queries, raw ratio {raw:.3f}"
            " (too few sub-second references to host-normalize)"
        ]
    code = raw / hf["factor"]
    verdict = "faster" if code < 1 else "slower"
    return [
        f"- {label}: {len(common)} common queries, raw ratio {raw:.3f}; "
        f"host factor {hf['factor']:.3f} "
        f"(median of {hf['n']}/{hf['n_pool']} stable sub-second refs, "
        f"IQR {hf['iqr_pct']:.1f}% / pool {hf['pool_iqr_pct']:.1f}%) → "
        f"**code ratio {code:.3f}** ({verdict})"
    ]


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        data = parse_round(path)
        if data and data.get("queries"):
            rounds.append(data)
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        with open(detail_path) as f:
            detail = json.load(f)
        if detail.get("queries"):
            detail["round"] = "cur"
            rounds.append(detail)
    if not rounds:
        print("no parseable BENCH records found")
        return

    names = sorted({n for r in rounds for n in r["queries"]})
    lines = [
        "# BENCH_NORMALIZED — query-set-normalized cross-round comparison",
        "",
        "Since round 10 the cross-round normalizer is IN-SWEEP: the",
        "host-speed factor between two rounds is the median per-query",
        "time ratio over the ~40 most stable sub-second queries common",
        "to both (scheduler/JVM-overhead-bound, so they track the host,",
        "not the code), with its IQR recorded; the code signal is the",
        "common-set raw ratio divided by that factor. `calib` (the old",
        "single-stage CPU hash burst) is kept as CONTEXT ONLY — it is",
        "frequency-unstable on this host (r9 measured 107% spread across",
        "10 interleaved samples) and manufactured a phantom 22% headline",
        "regression in r9 while the code got ~30% faster.",
        "",
        "## The r8→r9 story (so nobody re-derives it)",
        "",
        "Three signals disagreed in round 9. (1) The full-sweep common",
        "set (281 queries) fell 565.0→395.9 s — a real ~30% improvement,",
        "concentrated in the queries round 8 targeted (ann_recall_report",
        "42.8→5.6, stream_incremental_neardup 32.4→6.7, broker dashboard",
        "21.6→11.4, fuzzy_name_match 13.7→9.9). (2) The 57-query headline",
        "common set rose 72.9→88.9 s raw — a host-frequency phantom: the",
        "calibrator itself spread 107% across its own samples that round.",
        "(3) x_auc_quality 0.53→1.29 s is the one corroborated, DELIBERATE",
        "regression — the window-free histogram cumulation that removed",
        "the registry's last unpartitioned window (commit 0d6b34f); the",
        "old plan funneled the corpus through one task and dies at 100×",
        "scale, the new one is the right shape and cheap in absolute",
        "terms. Do not rediscover it as a riser. Sweep-only spikes on",
        "untouched code (x_positional_deletes 1.5→10.0, x_range_join_",
        "buckets 2.0→9.8) were single-rep artifacts, refuted by warm and",
        "parity measurements; since round 10 the sweep re-runs every >3 s",
        "entry at ≥3 reps and records medians, so that class self-refutes.",
        "",
        "## Round-12 notes: shared fronts and host drift",
        "",
        "(1) SHARED-FRONT ATTRIBUTION (the r11 advice item, wider since",
        "round 12): the E2 minhash/shingle family, the E8 BM25 family and",
        "the exact set-similarity pair share per-session materialized",
        "fronts (llm_data._shared_frame) — whichever family member runs",
        "first in a sweep pays the front passes, so per-query walls of",
        "the others under-report standalone cost. Compare these families",
        "by their FAMILY TOTALS across rounds, not per query:",
        "e2_{minhash_signatures,lsh_candidate_pairs,lsh_pairs_salted,",
        "pair_graph_triangles,pair_graph_kcore,dedup_clusters,neardup_",
        "dedup_corpus,minhash_calibration,jaccard_topk,containment_topk,",
        "similarity_histogram,prefix_filter_pairs,containment_filter_",
        "pairs}, e6_{cluster_safe_split,contrastive_pairs},",
        "e8_{inverted_index,bm25_topk,hybrid_rrf,prf_expansion,index_",
        "compaction}. (2) HOST DRIFT: the round-12 session measured a",
        "host_factor of 1.4157 (IQR 7.9%) vs the r11 sweep, and the box",
        "slowed DURING the session (calib 0.236→0.644 across windows) —",
        "raw r11→r12 per-query rises on untouched queries are host",
        "artifacts; the round's controlled same-session A/Bs live in",
        "OPTIMIZATION_r12.md.",
        "",
    ]

    lines += [
        "## Totals",
        "",
        "| | " + " | ".join(f"r{r['round']}" for r in rounds) + " |",
        "|---|" + "---|" * len(rounds),
        "| total raw s | "
        + " | ".join(f"{r.get('value', float('nan')):.2f}" for r in rounds)
        + " |",
        "| calib s (context) | "
        + " | ".join(
            f"{r['calib_sec']:.3f}" if r.get("calib_sec") else "—" for r in rounds
        )
        + " |",
        "| n queries | " + " | ".join(str(len(r["queries"])) for r in rounds) + " |",
        "",
        "## Cross-round code ratios (host-normalized, headline bench)",
        "",
    ]
    for a, b in zip(rounds, rounds[1:]):
        lines += pair_line(f"r{a['round']} → r{b['round']}", a, b)
    lines += [
        "",
        "## Per-query raw seconds",
        "",
        "| query | " + " | ".join(f"r{r['round']}" for r in rounds) + " |",
        "|---|" + "---|" * len(rounds),
    ]
    for n in names:
        cells = []
        for r in rounds:
            v = r["queries"].get(n)
            cells.append("—" if v is None else f"{v:.2f}")
        lines.append(f"| {n} | " + " | ".join(cells) + " |")

    # full-registry sweeps (tools/bench_full.py → BENCH_FULL_r{N}*.json)
    sweeps = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_FULL_r*.json"))):
        m = re.search(r"BENCH_FULL_r(\d+)", os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        if data.get("queries"):
            data["round"] = int(m.group(1))
            sweeps.append(data)
    sweeps.sort(key=lambda s: s["round"])
    if sweeps:
        lines += ["", "## Full-registry sweep (every batch query; >3 s entries are ≥3-rep medians since r10)", ""]
        for s in sweeps:
            timed = _timed(s["queries"])
            total = sum(timed.values())
            reps = s.get("reps", {})
            lines.append(
                f"- r{s['round']}: {len(s['queries'])} queries, "
                f"{s.get('n_errors', '?')} errors, total raw {total:.1f} s"
                f" (calib {s.get('calib_sec', float('nan')):.3f};"
                f" {len(reps)} entries re-repped)"
            )
        lines += ["", "## Cross-round code ratios (host-normalized, full sweep)", ""]
        for a, b in zip(sweeps, sweeps[1:]):
            lines += pair_line(f"r{a['round']} → r{b['round']}", a, b)
        cur = sweeps[-1]
        timed = _timed(cur["queries"])
        lines += ["", f"### r{cur['round']} slowest 15 (raw s)", ""]
        for n, v in sorted(timed.items(), key=lambda kv: -kv[1])[:15]:
            rep_note = ""
            reps = cur.get("reps", {}).get(n)
            if reps:
                rep_note = f"  (median of {len(reps)}: {reps})"
            lines.append(f"- {n}: {v:.2f}{rep_note}")
        if len(sweeps) > 1:
            prev = sweeps[-2]
            p_t, c_t = _timed(prev["queries"]), _timed(cur["queries"])
            hf = host_factor(prev["queries"], cur["queries"])
            f = hf["factor"] if hf else 1.0
            regressions = []
            for n in set(p_t) & set(c_t):
                a, b = p_t[n], c_t[n] / f
                if a >= 0.2 and b > 2.0 * a:
                    regressions.append((n, a, b))
            lines += [
                "",
                f"### Sweep regressions vs r{prev['round']} "
                f"(host-normalized >2×, ≥0.2 s base)",
                "",
            ]
            if regressions:
                for n, a, b in sorted(regressions, key=lambda t: -(t[2] / t[1])):
                    lines.append(f"- {n}: {a:.2f} → {b:.2f} ({b / a:.1f}×)")
            else:
                lines.append("- none")

    out = "\n".join(lines) + "\n"
    out_path = os.path.join(repo, "BENCH_NORMALIZED.md")
    with open(out_path, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
