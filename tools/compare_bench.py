#!/usr/bin/env python3
"""Mechanical scale-regression detector over two Bench JSON artifacts.

Usage: python3 tools/compare_bench.py <old.json> <new.json> [ratio]

Reads the one-line JSON graft.Bench emits ({"queries": {name: sec},
"runs": {name: [cold, warm, ...]}, ...}), joins the two files on query
name, and flags every query whose new/old ratio exceeds the threshold
(default 1.5 — above the measured ~1.35x host-noise spread; see
docs/ROUND8_NOTES.md). Sub-100ms absolutes are exempt: at that size the
ratio is all fixed overhead and jitter.

Intended pairs:
  - same SF across rounds (docs/bench_sf1.json r7 vs r8): regression gate
  - sf1 vs sf10 in one round: scaling-exponent readout (prints ratio
    table; 10x data should be well under 10x time for sub-linear ops)

Exit code 1 iff any query is flagged, so a driver/CI can gate on it.
This file is a DEV TOOL only - the Scala library has no Python deps.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    flagged = []
    ratios = []
    for name in common:
        o, n = float(qo[name]), float(qn[name])
        if o <= 0:
            continue
        r = n / o
        ratios.append(r)
        if r > thr and n >= 0.1:
            flagged.append((name, o, n, r))
    ratios.sort()
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"{len(common)} common queries  "
          f"old_total={sum(float(qo[q]) for q in common):.1f}s  "
          f"new_total={sum(float(qn[q]) for q in common):.1f}s  "
          f"median_ratio={med:.3f}  threshold={thr}")
    if only_old:
        print(f"dropped queries (in old only): {', '.join(only_old)}")
    if only_new:
        print(f"new queries (in new only): {', '.join(only_new)}")
    for name, o, n, r in sorted(flagged, key=lambda t: -t[3]):
        print(f"FLAG  {name}: {o:.3f}s -> {n:.3f}s  ({r:.2f}x)")
    failed = set(old.get("failed", [])) | set(new.get("failed", []))
    for name in sorted(failed):
        print(f"FLAG  {name}: marked failed in an artifact")
    if not flagged and not failed:
        print("no regressions above threshold")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
