#!/usr/bin/env python3
"""Derive the per-key bench noise envelope from repeated same-code runs.

Usage:
  python3 tools/bench_envelope.py run1.json run2.json [run3.json ...] \
      [--out BENCH_ENVELOPE.json] [--md]

Reads N graft.Bench JSON lines (same code, same data, back-to-back runs),
computes per-key min/max/spread (max/min), and writes an envelope file that
`bench_compare.py` applies on top of its global ratio: a key only flags as a
regression when it exceeds BOTH the global ratio and its measured same-code
spread x margin. With --md, prints the BASELINE.md variance table.

The envelope records the commit it was measured at; `bench_compare.py` warns
when the envelope is stale (measured at a different commit than HEAD), since
a spread measured on old code says nothing about keys the new code changed.

Rationale: three consecutive judge rounds saw 2x same-code swings in driver
artifacts (scan keys r02, text_contamination/tpch_q21 r03) that later
recovered with zero code change. "Probably noise" is unfalsifiable without a
measured envelope; this pins it.
"""
import argparse
import json
import subprocess


def load(path):
    """Parse the LAST valid JSON line of a Bench output file (a file captured
    from sbt may hold log lines or several Bench objects; last wins)."""
    last = None
    with open(path) as f:
        for line in f:
            line = line.replace("[info] ", "").strip()
            if not line.startswith("{"):
                continue
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                continue
    if last is None:
        raise SystemExit(f"{path}: no parseable JSON line found")
    if not isinstance(last.get("queries"), dict):
        raise SystemExit(f"{path}: JSON line has no 'queries' object")
    return {k: v for k, v in last["queries"].items() if isinstance(v, (int, float))}


def head_commit():
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("runs", nargs="+", help="graft.Bench JSON output files")
    ap.add_argument("--out", default="BENCH_ENVELOPE.json")
    ap.add_argument("--md", action="store_true",
                    help="print the BASELINE.md variance table")
    opts = ap.parse_args()

    runs = [load(p) for p in opts.runs]
    keys = sorted(set.intersection(*(set(r) for r in runs)))
    if not keys:
        raise SystemExit("no query key appears in every run — nothing to envelope")
    env = {}
    for k in keys:
        vals = [r[k] for r in runs]
        # floor the denominator at 10ms: a zero-or-near-zero timing is
        # scheduler noise, and a literal 0 would divide-by-zero the spread
        env[k] = {
            "min": round(min(vals), 4),
            "max": round(max(vals), 4),
            "spread": round(max(vals) / max(min(vals), 0.01), 3),
        }
    with open(opts.out, "w") as f:
        json.dump({"runs": len(runs), "commit": head_commit(), "keys": env},
                  f, indent=1, sort_keys=True)
    spreads = sorted((v["spread"], k) for k, v in env.items())
    big = [(s, k) for s, k in spreads if s > 1.5 and env[k]["min"] >= 0.25]
    print(f"envelope over {len(runs)} runs, {len(keys)} keys -> {opts.out}")
    print(f"median spread {spreads[len(spreads) // 2][0]:.2f}x, "
          f"p90 {spreads[int(len(spreads) * 0.9)][0]:.2f}x, "
          f"max {spreads[-1][0]:.2f}x ({spreads[-1][1]})")
    if big:
        print("same-code spreads >1.5x on real (>=0.25s) workloads:")
        for s, k in big:
            print(f"  {k}: {env[k]['min']:.2f}-{env[k]['max']:.2f}s ({s:.2f}x)")
    if opts.md:
        print("\n| key | min s | max s | spread |")
        print("|---|---|---|---|")
        for s, k in reversed(spreads[-15:]):
            print(f"| `{k}` | {env[k]['min']:.2f} | {env[k]['max']:.2f} | {s:.2f}x |")


if __name__ == "__main__":
    main()
