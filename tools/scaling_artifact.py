#!/usr/bin/env python3
"""Build SCALING.md from three full-suite Bench runs (sf0.001 / sf0.01
/ sf0.1, run back-to-back on an otherwise idle machine). The per-query
sf0.1/sf0.01 cost ratio is the cheapest available proxy for the 100x
question: data grows 10x between those points, so a scan/shuffle-bound
query should grow <=~10x and most of this suite (fixed grids, per-
series kernels over constant-length series, calendar-sized outputs)
should grow far less. Queries are flagged when the 10x-data ratio
exceeds 10 with absolute cost above noise.

Usage: python3 tools/scaling_artifact.py b001.json b01.json b1.json
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d


def main():
    b001, b01, b1 = (load(p) for p in sys.argv[1:4])
    q001, q01, q1 = b001["queries"], b01["queries"], b1["queries"]
    keys = sorted(set(q001) & set(q01) & set(q1))
    NOISE = 0.25  # below this many seconds, ratios are timer noise
    rows = []
    for k in keys:
        a, b, c = q001[k], q01[k], q1[k]
        r10 = c / b if b > 0 else float("nan")
        flag = "SUPER-LINEAR" if (r10 > 10.0 and c > NOISE) else ""
        rows.append((k, a, b, c, r10, flag))
    rows.sort(key=lambda r: -r[4])
    out = []
    out.append("# SCALING — per-query cost across sf0.001 / sf0.01 / sf0.1\n")
    out.append(
        "Three clean full-suite Bench runs (local[32], no concurrent\n"
        "load; `runs` and wall in each source artifact). The headline\n"
        "column is **r(0.1/0.01)** — the cost ratio across a 10× data\n"
        "step. A scan- or shuffle-bound query should show ≤~10; grid-\n"
        "bound and calendar-sized queries should show ~1. Queries are\n"
        f"flagged only when r > 10 AND sf0.1 cost > {0.25} s (below\n"
        "that, single-digit-millisecond timer noise dominates the\n"
        "ratio).\n\n")
    out.append(f"Totals: sf0.001 {b001['value']:.1f} s · sf0.01 "
               f"{b01['value']:.1f} s · sf0.1 {b1['value']:.1f} s "
               f"({len(keys)} queries)\n\n")
    out.append("| query | sf0.001 s | sf0.01 s | sf0.1 s | r(0.1/0.01) | flag |\n")
    out.append("|---|---|---|---|---|---|\n")
    for k, a, b, c, r, flag in rows:
        out.append(f"| {k} | {a:.3f} | {b:.3f} | {c:.3f} | {r:.2f} | {flag} |\n")
    flagged = [r for r in rows if r[5]]
    out.append("\n## Reading\n\n")
    if flagged:
        out.append("Flagged super-linear queries (investigate or justify):\n")
        for k, a, b, c, r, _ in flagged:
            out.append(f"- `{k}`: {b:.2f} s → {c:.2f} s ({r:.1f}×)\n")
    else:
        out.append("No query exceeds 10× across the 10× data step at a "
                   "cost above noise.\n")
    open("SCALING.md", "w").write("".join(out))
    print(f"wrote SCALING.md ({len(keys)} queries, {len(flagged)} flagged)")


if __name__ == "__main__":
    main()
