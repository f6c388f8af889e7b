#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. sf0.1 vs sf1) and report per-query
scaling ratios vs the data-size ratio. Flags queries scaling worse than
`threshold` x the data ratio (superlinear red flags). Dev tool.

Usage: python3 tools/scaling_report.py <small.log> <big.log> [data_ratio=10] [out.json]
"""
import json, sys

def load(path):
    line = [l for l in open(path) if '"metric":"total"' in l][-1]
    return json.loads(line[line.index('{'):])

small, big = load(sys.argv[1]), load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
out_path = sys.argv[4] if len(sys.argv) > 4 else None

rows = []
for q, t_small in sorted(small["queries"].items()):
    t_big = big["queries"].get(q)
    if t_big is None or t_small is None:
        rows.append((q, t_small, t_big, None)); continue
    # fixed overhead floor: sub-200ms timings are dominated by job setup, the
    # ratio there measures Spark constant costs, not the operator
    r = t_big / max(t_small, 1e-9)
    rows.append((q, t_small, t_big, r))

flagged = []
print(f"{'query':28s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
for q, a, b, r in rows:
    mark = ""
    if r is not None and b > 1.0 and r > ratio * 1.5:
        mark = "  <-- SUPERLINEAR"
        flagged.append(q)
    rs = f"{r:7.2f}" if r is not None else "   MISS"
    fa = f"{a:8.2f}" if a is not None else "    null"
    fb = f"{b:8.2f}" if b is not None else "    null"
    print(f"{q:28s} {fa} {fb} {rs}{mark}")

print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
      f"(x{big['value']/small['value']:.2f} at data x{ratio:.0f})")
print(f"pipeline: {small['pipeline_rows_per_sec']:.0f} -> "
      f"{big['pipeline_rows_per_sec']:.0f} rows/s")
print("flagged:", flagged if flagged else "none")

if out_path:
    json.dump({
        "data_ratio": ratio,
        "small": {"sf": small["sf"], "total_sec": small["value"],
                  "pipeline_rows_per_sec": small["pipeline_rows_per_sec"],
                  "queries": small["queries"]},
        "big": {"sf": big["sf"], "total_sec": big["value"],
                "pipeline_rows_per_sec": big["pipeline_rows_per_sec"],
                "queries": big["queries"]},
        "ratios": {q: r for q, _, _, r in rows if r is not None},
        "superlinear_flagged": flagged,
    }, open(out_path, "w"), indent=1)
    print("wrote", out_path)
