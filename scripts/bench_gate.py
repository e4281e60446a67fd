#!/usr/bin/env python3
"""Bench regression gate: compare a graft.Bench JSON line against the
recorded baseline (BENCH_BASELINE.json, sf0.1 local[32]).

Fails if:
  - any query hit the -1 error sentinel;
  - any baseline query is missing from the current run (a query silently
    dropped from the suite must not pass the gate);
  - any query regressed more than 2x the baseline plus 1s absolute slack
    AND the regression survives a confirmation re-run (--rerun-cmd).

Sandbox contention can manufacture 15x phantom regressions on trivial
scan-project queries (observed in round 2: contiguous alphabetical runs
slow while interleaved heavy queries sped up). So when >2x offenders are
found and a re-run command is available, the gate re-runs the bench once
and only fails queries slow in BOTH runs (per-query min over runs).

Usage: scripts/bench_gate.py <bench.json> [baseline.json] [--rerun-cmd CMD]
  CMD must print the graft.Bench JSON line on stdout (last line wins).
"""
import json
import subprocess
import sys


def load(path):
    return json.load(open(path))


def over_threshold(secs, b):
    return b is not None and b > 0 and secs > 2 * b + 1.0


def main():
    args = [a for a in sys.argv[1:]]
    rerun_cmd = None
    if "--rerun-cmd" in args:
        i = args.index("--rerun-cmd")
        if i + 1 >= len(args):
            sys.exit("bench_gate: --rerun-cmd requires a command argument")
        rerun_cmd = args[i + 1]
        del args[i : i + 2]

    cur = load(args[0])
    base = load(args[1] if len(args) > 1 else "BENCH_BASELINE.json")

    fails = []
    missing = sorted(set(base["queries"]) - set(cur["queries"]))
    for name in missing:
        fails.append(f"{name}: MISSING from current run (present in baseline)")

    errored = []
    slow = []
    for name, secs in sorted(cur["queries"].items()):
        if secs < 0:
            errored.append(
                f"{name}: FAILED ({cur.get('errors', {}).get(name, 'no message')})"
            )
            continue
        if over_threshold(secs, base["queries"].get(name)):
            slow.append(name)

    if slow and rerun_cmd:
        print(f"{len(slow)} queries >2x baseline; re-running once to rule out "
              f"sandbox contention: {', '.join(slow)}")
        out = subprocess.run(
            rerun_cmd, shell=True, capture_output=True, text=True
        ).stdout.strip().splitlines()
        # a non-JSON last line (a log message, an empty run) must degrade
        # to "nothing cleared", not crash the gate mid-decision
        try:
            rerun = json.loads(out[-1]) if out else {"queries": {}}
        except ValueError:
            print("  re-run produced no parseable bench JSON; "
                  "keeping original measurements")
            rerun = {"queries": {}}
        if "queries" not in rerun:
            rerun = {"queries": {}}
        confirmed = []
        for name in slow:
            r = rerun["queries"].get(name)
            best = min(x for x in [cur["queries"][name], r] if x is not None and x >= 0) \
                if (r is not None and r >= 0) else cur["queries"][name]
            if over_threshold(best, base["queries"].get(name)):
                confirmed.append(name)
            else:
                print(f"  {name}: cleared on re-run "
                      f"({cur['queries'][name]:.2f}s -> {r:.2f}s)")
        slow = confirmed

    confirmed_label = "confirmed by re-run" if rerun_cmd else "no re-run performed"
    for name in slow:
        fails.append(f"{name}: {cur['queries'][name]:.2f}s vs baseline "
                     f"{base['queries'][name]:.2f}s (>2x, {confirmed_label})")
    fails.extend(errored)

    print(f"bench gate: {len(cur['queries'])} queries, "
          f"total {cur['value']:.1f}s vs baseline {base['value']:.1f}s")
    if fails:
        print("REGRESSIONS:")
        for f in fails:
            print(" ", f)
        sys.exit(1)
    print("no regressions > 2x baseline; no baseline queries missing")


if __name__ == "__main__":
    main()
