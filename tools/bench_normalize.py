"""Calibration-normalized cross-round bench report (VERDICT r5 #7).

bench.py records ``calib_sec`` — the wall time of a fixed CPU-bound job
(hash 200M longs) that scales with the host's effective core speed —
precisely so cross-round comparisons on different/loaded hosts don't
read host effects as code regressions. This tool consumes it: for every
round whose BENCH_r{N}.json parses, print per-query and total times
both raw and divided by that round's calib_sec (a dimensionless
"calibration units" figure comparable across hosts), plus the
round-over-round ratio on the common query set.

Rounds before r5 predate calib_sec; they appear raw-only.

Usage: python tools/bench_normalize.py [repo_dir]  (writes
BENCH_NORMALIZED.md and prints the summary table)
"""

from __future__ import annotations

import glob
import json
import os
import re
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
        # tail may hold exactly the line plus nothing; fall back to a
        # brace-balanced scan
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
    # the working tree's BENCH_DETAIL.json is the in-progress round
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
        "# BENCH_NORMALIZED — calibration-normalized cross-round comparison",
        "",
        "`calib` = wall seconds of bench.py's fixed CPU-bound hash job on",
        "that round's host; `norm` = query_sec / calib (dimensionless,",
        "host-speed-independent). Rounds without calib_sec (pre-r5) show",
        "raw seconds only — do NOT read their deltas as code changes.",
        "",
    ]
    # calibration-divergence check (round 9): the hash job is a pure-CPU
    # single-stage burst (turbo/frequency-sensitive); the queries are
    # scheduling/JVM-bound. When calib moves a lot between consecutive
    # rounds while the COMMON-query raw total barely moves, the norm
    # column is measuring the calibrator, not the code — flag it and
    # point the reader at the raw common-set ratio instead.
    for prev, cur in zip(rounds, rounds[1:]):
        if not (prev.get("calib_sec") and cur.get("calib_sec")):
            continue
        common = [n for n in prev["queries"] if n in cur["queries"]]
        if len(common) < 20:
            continue
        raw_ratio = sum(cur["queries"][n] for n in common) / max(
            sum(prev["queries"][n] for n in common), 1e-9
        )
        calib_ratio = cur["calib_sec"] / prev["calib_sec"]
        # calibrator-dominated pair: calib moved a lot while the common
        # raw total barely moved, OR moved the OPPOSITE direction (the
        # r8->r9 case: calib said 1.9x faster host while Spark-bound raw
        # rose 15% — frequency scaling hits the tight hash loop and the
        # JVM/scheduler-bound queries differently)
        if abs(calib_ratio - 1) > 0.25 and (
            abs(raw_ratio - 1) < 0.10
            or (raw_ratio - 1) * (calib_ratio - 1) <= 0
        ):
            lines += [
                f"> **Calibration divergence r{prev['round']}→r{cur['round']}:** "
                f"calib moved {calib_ratio:.2f}× while the {len(common)}-query "
                f"common-set raw total moved {raw_ratio:.2f}×. The norm column "
                "is dominated by the calibrator's frequency sensitivity here — "
                "read the raw common-set ratio as the code-change signal for "
                "this pair.",
                "",
            ]
    hdr = "| round | " + " | ".join(
        f"r{r['round']}" for r in rounds
    ) + " |"
    lines += [
        "## Totals",
        "",
        "| | " + " | ".join(f"r{r['round']}" for r in rounds) + " |",
        "|---|" + "---|" * len(rounds),
        "| total raw s | "
        + " | ".join(f"{r.get('value', float('nan')):.2f}" for r in rounds)
        + " |",
        "| calib s | "
        + " | ".join(
            f"{r['calib_sec']:.3f}" if r.get("calib_sec") else "—" for r in rounds
        )
        + " |",
        "| total norm | "
        + " | ".join(
            f"{r['value'] / r['calib_sec']:.1f}" if r.get("calib_sec") else "—"
            for r in rounds
        )
        + " |",
        "| n queries | " + " | ".join(str(len(r["queries"])) for r in rounds) + " |",
        "",
        "## Per-query (raw s → norm where calib exists)",
        "",
        "| query | " + " | ".join(f"r{r['round']}" for r in rounds) + " |",
        "|---|" + "---|" * len(rounds),
    ]
    for n in names:
        cells = []
        for r in rounds:
            v = r["queries"].get(n)
            if v is None:
                cells.append("—")
            elif r.get("calib_sec"):
                cells.append(f"{v:.2f} → {v / r['calib_sec']:.2f}")
            else:
                cells.append(f"{v:.2f}")
        lines.append(f"| {n} | " + " | ".join(cells) + " |")

    # round-over-round normalized ratio on common sets
    lines += ["", "## Round-over-round (normalized where possible)", ""]
    for a, b in zip(rounds, rounds[1:]):
        common = set(a["queries"]) & set(b["queries"])
        if not common:
            continue
        ta = sum(a["queries"][n] for n in common)
        tb = sum(b["queries"][n] for n in common)
        if a.get("calib_sec") and b.get("calib_sec"):
            ratio = (tb / b["calib_sec"]) / (ta / a["calib_sec"])
            kind = "normalized"
            # always show the raw ratio alongside: when the calibrator
            # diverges (see the header notes) raw is the honest signal
            extra = f", raw ratio {tb / ta:.3f}"
        else:
            ratio = tb / ta
            kind = "raw (no calib on one side)"
            extra = ""
        lines.append(
            f"- r{a['round']} → r{b['round']}: {len(common)} common queries, "
            f"{kind} ratio {ratio:.3f} ({'faster' if ratio < 1 else 'slower'})"
            f"{extra}"
        )

    # full-registry one-rep sweeps (tools/bench_full.py → BENCH_FULL_r{N}.json;
    # VERDICT r6 #7: every batch query timed once so untimed-query regressions
    # can't hide behind the headline set)
    sweeps = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_FULL_r*.json"))):
        m = re.search(r"BENCH_FULL_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        if data.get("queries"):
            data["round"] = int(m.group(1))
            sweeps.append(data)
    if sweeps:
        lines += ["", "## Full-registry sweep (one rep per batch query)", ""]
        for s in sweeps:
            calib = s.get("calib_sec")
            total = sum(s["queries"].values())
            norm = f", total norm {total / calib:.1f}" if calib else ""
            lines.append(
                f"- r{s['round']}: {len(s['queries'])} queries, "
                f"{s.get('n_errors', '?')} errors, total raw {total:.1f} s"
                f" (calib {calib:.3f}{norm})"
            )
        cur = sweeps[-1]
        calib = cur.get("calib_sec") or 1.0
        lines += [
            "",
            f"### r{cur['round']} slowest 15 (raw s → norm)",
            "",
        ]
        for n, v in sorted(cur["queries"].items(), key=lambda kv: -kv[1])[:15]:
            lines.append(f"- {n}: {v:.2f} → {v / calib:.2f}")
        if len(sweeps) > 1:
            prev = sweeps[-2]
            common = set(prev["queries"]) & set(cur["queries"])
            pc, cc = prev.get("calib_sec"), cur.get("calib_sec")
            regressions = []
            for n in common:
                a, b = prev["queries"][n], cur["queries"][n]
                if pc and cc:
                    a, b = a / pc, b / cc
                if a >= 0.2 and b > 2.0 * a:
                    regressions.append((n, a, b))
            lines += ["", f"### Sweep regressions vs r{prev['round']} (norm >2×, ≥0.2 base)", ""]
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
