#!/usr/bin/env python3
"""Bench regression gate: compare a graft.Bench JSON line against the
recorded baseline (BENCH_BASELINE.json, sf0.1 local[32]).

Fails if any query hit the -1 error sentinel, or regressed more than 2x
the baseline plus 1s absolute slack (run-to-run variance on this box is
~+-2s on the heavy queries, well inside 2x for anything that matters).

Usage: scripts/bench_gate.py <bench.json> [baseline.json]
"""
import json
import sys

cur = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"))

fails = []
for name, secs in sorted(cur["queries"].items()):
    if secs < 0:
        fails.append(f"{name}: FAILED ({cur.get('errors', {}).get(name, 'no message')})")
        continue
    b = base["queries"].get(name)
    if b is not None and b > 0 and secs > 2 * b + 1.0:
        fails.append(f"{name}: {secs:.2f}s vs baseline {b:.2f}s (>2x)")

print(f"bench gate: {len(cur['queries'])} queries, "
      f"total {cur['value']:.1f}s vs baseline {base['value']:.1f}s")
if fails:
    print("REGRESSIONS:")
    for f in fails:
        print(" ", f)
    sys.exit(1)
print("no regressions > 2x baseline")
