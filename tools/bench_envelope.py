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

Rationale: three consecutive judge rounds saw 2x same-code swings in driver
artifacts (scan keys r02, text_contamination/tpch_q21 r03) that later
recovered with zero code change. "Probably noise" is unfalsifiable without a
measured envelope; this pins it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().replace("[info] ", ""))
    return {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = "BENCH_ENVELOPE.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        args.remove(out)
    runs = [load(p) for p in args]
    keys = sorted(set.intersection(*(set(r) for r in runs)))
    env = {}
    for k in keys:
        vals = [r[k] for r in runs]
        env[k] = {
            "min": round(min(vals), 4),
            "max": round(max(vals), 4),
            "spread": round(max(vals) / min(vals), 3),
        }
    with open(out, "w") as f:
        json.dump({"runs": len(runs), "keys": env}, f, indent=1, sort_keys=True)
    spreads = sorted((v["spread"], k) for k, v in env.items())
    big = [(s, k) for s, k in spreads if s > 1.5 and env[k]["min"] >= 0.25]
    print(f"envelope over {len(runs)} runs, {len(keys)} keys -> {out}")
    print(f"median spread {spreads[len(spreads) // 2][0]:.2f}x, "
          f"p90 {spreads[int(len(spreads) * 0.9)][0]:.2f}x, "
          f"max {spreads[-1][0]:.2f}x ({spreads[-1][1]})")
    if big:
        print("same-code spreads >1.5x on real (>=0.25s) workloads:")
        for s, k in big:
            print(f"  {k}: {env[k]['min']:.2f}-{env[k]['max']:.2f}s ({s:.2f}x)")
    if "--md" in sys.argv:
        print("\n| key | min s | max s | spread |")
        print("|---|---|---|---|")
        for s, k in reversed(spreads[-15:]):
            print(f"| `{k}` | {env[k]['min']:.2f} | {env[k]['max']:.2f} | {s:.2f}x |")


if __name__ == "__main__":
    main()
