#!/usr/bin/env python3
"""Calibration-normalized comparison of two Bench artifacts.

Two BENCH.json files measured on the same rig can still differ 2-3×
wholesale because the HOST was slower (co-tenant load, thermal state)
— round 11 shipped an 82.4 s clean-calib artifact while the driver's
re-run read 93.1 s with a 3.4× slower calibration probe. This tool
makes that class of confusion mechanically explainable: it divides
each side's per-query medians by its own calibration time (the
fixed-work CPU probe Bench runs first, calib_s[0]) before computing
ratios, then flags only the queries whose DRIFT-CORRECTED ratio
exceeds the threshold.

Round 13: in-suite GC time is also subtracted before flagging — the
calibration probe catches host drift but not JVM heap history (the
round-12 verdict's 1.27x same-code artifact delta was GC, spread
across mid-weight queries). Each side's per-query time is reduced by
its measured gc_ms amortized over that query's timed run count
(runs_n when the artifact has it, the configured `runs` otherwise).
Round 14 (ADVICE): the subtraction is CAPPED at 25% of the raw time
— the old t/2 floor let a raw 2.0x slowdown with large gc_ms adjust
to exactly 1.0x. Under the cap, a regression beyond threshold/0.75
(e.g. 2.0x raw at the default 1.5x threshold) always flags even if
GC accompanies it; GC-attributable drift up to 25% of a run is still
forgiven.

Usage: bench_compare.py OLD.json NEW.json [threshold=1.5]

Exit 1 if any query regresses beyond the threshold after calibration
correction.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "queries" not in d or not isinstance(d["queries"], dict):
        sys.exit(f"{path}: not a Bench artifact (no queries dict)")
    calib = d.get("calib_s")
    if not calib:
        print(f"WARNING {path}: no calib_s — assuming calibration 1.0")
        c = 1.0
    else:
        # calib_s = [suite-start, suite-end]; the start probe reflects
        # the host state the measurements began under
        c = float(calib[0])
    return d, c


def gc_adjusted(d, q):
    """Per-query median time minus its amortized in-suite GC share;
    the subtraction is capped at 25% of the raw time (see module
    doc — the cap bounds how much a pathological gc reading can
    forgive)."""
    t = d["queries"][q]
    gc_s = d.get("gc_ms", {}).get(q, 0) / 1000.0
    n = d.get("runs_n", {}).get(q) or d.get("runs", 1) or 1
    return t - min(gc_s / n, 0.25 * t)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, c_old = load(sys.argv[1])
    new, c_new = load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    drift = c_new / c_old
    print(f"calib old={c_old:.3f}s new={c_new:.3f}s -> host drift {drift:.2f}x"
          f" (ratios below are drift-corrected)")

    common = sorted(set(old["queries"]) & set(new["queries"]))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"new queries ({len(only_new)}): {', '.join(only_new)}")

    tot_old = sum(old["queries"][q] for q in common)
    tot_new = sum(new["queries"][q] for q in common)
    corr_total = (tot_new / c_new) / (tot_old / c_old)
    print(f"common-query totals: old={tot_old:.1f}s new={tot_new:.1f}s "
          f"raw {tot_new / tot_old:.2f}x, corrected {corr_total:.2f}x")
    adj_old = sum(gc_adjusted(old, q) for q in common)
    adj_new = sum(gc_adjusted(new, q) for q in common)
    print(f"gc-adjusted totals:  old={adj_old:.1f}s new={adj_new:.1f}s "
          f"corrected {(adj_new / c_new) / (adj_old / c_old):.2f}x")

    regressions = []
    for q in common:
        o, n = gc_adjusted(old, q), gc_adjusted(new, q)
        if o <= 0:
            continue
        corr = (n / c_new) / (o / c_old)
        # sub-0.4s queries sit on the scheduling noise floor
        if corr > thresh and n > 0.4:
            regressions.append((corr, q, old["queries"][q],
                                new["queries"][q]))
    regressions.sort(reverse=True)
    for corr, q, o, n in regressions:
        print(f"REGRESSION {q:28s} {o:7.2f}s -> {n:7.2f}s "
              f"gc-adj corrected {corr:.2f}x")
    if not regressions:
        print(f"no drift-corrected per-query regression beyond {thresh}x")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
