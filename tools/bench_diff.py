#!/usr/bin/env python3
"""Diff two graft.Bench runs so real regressions separate from warm-up noise.

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 1.5]

OLD/NEW may each be:
  - a driver BENCH_r{N}.json wrapper ({"tail": "...", ...}) whose tail may be
    front-truncated mid-JSON, or
  - a file containing the raw one-line Bench JSON
    ({"metric": ..., "queries": {...}, ...}).
Query timings are recovered by regex, so a truncated tail still yields every
fully-present "name":seconds pair.

The first-executed query of a run pays ~4-5s of JIT/session warm-up
(BASELINE.md), so the biggest absolute delta alone is not a regression;
look for queries that regress in BOTH directions of the comparison set.
"""
import json
import re
import sys

PAIR = re.compile(r'"([a-z][a-z0-9_]*)"\s*:\s*([0-9]+(?:\.[0-9]+)?)')
NOT_QUERIES = {"metric", "value", "sf", "n", "rc", "cpus", "parsed",
               "total_sec", "runs", "agg"}


def load(path):
    text = open(path).read()
    try:
        j = json.loads(text)
        if isinstance(j, dict) and "tail" in j:
            text = j["tail"]
        elif isinstance(j, dict) and "queries" in j:
            return {k: float(v) for k, v in j["queries"].items()}
    except json.JSONDecodeError:
        pass
    return {k: float(v) for k, v in PAIR.findall(text) if k not in NOT_QUERIES}


def main():
    # manual parse so the space-form "--threshold 1.5" value is consumed
    # and never mistaken for a positional file path
    args, thr, it = [], 1.5, iter(sys.argv[1:])
    for a in it:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else next(it))
        else:
            args.append(a)
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new))
    print(f"{len(old)} old / {len(new)} new / {len(common)} common queries")
    print(f"{'query':<26}{'old':>8}{'new':>8}{'ratio':>8}")
    flagged = []
    for k in sorted(common, key=lambda k: new[k] / max(old[k], 1e-9), reverse=True):
        r = new[k] / max(old[k], 1e-9)
        mark = ""
        if r >= thr and new[k] - old[k] > 0.3:
            mark = "  <-- slower"
            flagged.append(k)
        elif r <= 1 / thr and old[k] - new[k] > 0.3:
            mark = "  (faster)"
        print(f"{k:<26}{old[k]:>8.2f}{new[k]:>8.2f}{r:>8.2f}{mark}")
    t_old, t_new = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"\ncommon-query total: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / max(t_old, 1e-9):.2f}x)")
    if flagged:
        print(f"flagged >={thr}x AND >0.3s slower: {', '.join(flagged)}")
        print("(first-executed query each run pays JIT warm-up — confirm "
              "a flag reproduces before chasing it)")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped into head
        sys.exit(0)
