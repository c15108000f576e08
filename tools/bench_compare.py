#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against a pinned baseline run.

Usage:
  python3 tools/bench_compare.py <current.json> <baseline.json> [ratio]

Each file holds one Bench output line ({"metric":"total",...,"queries":{...}})
or the driver's BENCH_r{N}.json wrapper (fields parsed from its "tail").
Flags every query slower than `ratio` x baseline (default 1.5), every new
error entry, and prints added/removed keys. Exit 1 if regressions exist.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        raw = f.read().replace("[info] ", "")
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {}
    if "queries" in d:
        qs = d["queries"]
        errs = {k for k, v in qs.items() if isinstance(v, dict)}
        return {k: v for k, v in qs.items() if isinstance(v, (int, float))}, errs
    # driver wrapper: timings live in the truncated "tail" string
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)', d.get("tail", raw))
    return {k: float(v) for k, v in pairs}, set()


def main():
    cur_path, base_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    cur, cur_errs = load(cur_path)
    base, _ = load(base_path)

    # floor: sub-quarter-second queries are scheduler-noise-dominated at
    # local[32] (a 60ms jitter reads as 1.5x) — compare only real workloads
    regressions = []
    for k in sorted(cur.keys() & base.keys()):
        if base[k] >= 0.25 and cur[k] > ratio * base[k]:
            regressions.append((k, base[k], cur[k]))
    for k, b, c in regressions:
        print(f"REGRESSION {k}: {b:.2f}s -> {c:.2f}s ({c / b:.1f}x)")
    for k in sorted(cur_errs):
        print(f"ERROR {k}: query failed in current run")
    added = sorted(cur.keys() - base.keys())
    removed = sorted(base.keys() - cur.keys())
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_c, tot_b = sum(cur.values()), sum(base.values())
    print(f"total: {tot_c:.1f}s over {len(cur)} vs baseline {tot_b:.1f}s over {len(base)}")
    if regressions or cur_errs:
        sys.exit(1)
    print("OK: no per-query regression above "
          f"{ratio}x and no errors")


if __name__ == "__main__":
    main()
