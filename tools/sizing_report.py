#!/usr/bin/env python3
"""Turn graft.Sizing measurements into SIZING.md — the per-operator 100 TB
capacity sheet. Input: one or two SIZING json lines (sf0.1 and, ideally, sf1);
with two scales the report also shows whether the shuffle-per-input-byte ratio
is STABLE across the decade, which is what justifies (or refutes) the linear
extrapolation.

Usage: python3 tools/sizing_report.py SIZING_sf01.json [SIZING_sf1.json] [out.md]
"""
import json, sys

TARGET_TB = 100.0
TARGET_BYTES = TARGET_TB * 1e12          # 100 TB of compressed input
PARTITION_TARGET = 200 * 1024 * 1024     # 200 MiB shuffle partition target


def load(path):
    return json.load(open(path))


small = load(sys.argv[1])
big = load(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].endswith(".json") \
    else None
out_path = sys.argv[3] if len(sys.argv) > 3 else (
    sys.argv[2] if len(sys.argv) > 2 and sys.argv[2].endswith(".md") else
    "SIZING.md")

base = big if big else small
lines = []
lines.append("# SIZING — per-operator 100 TB capacity sheet")
lines.append("")
lines.append(
    "Measured shuffle volume per operator (`graft.Sizing`: task-metrics "
    "listener over one noop-sink run per query — volumes are deterministic "
    "per plan + data, unlike wall times). `ratio` = shuffle-write bytes per "
    "byte of compressed parquet scanned; the 100 TB columns extrapolate that "
    "ratio to a 100 TB compressed input and size "
    "`spark.sql.shuffle.partitions` at a 200 MiB per-partition target. "
    f"Primary scale: `{base['sf']}`."
    + (" Stability column: ratio at sf1 / ratio at sf0.1 — values near 1 "
       "mean the shuffle fraction held across a decade of data and the "
       "linear extrapolation is evidence, not hope." if big else ""))
lines.append("")
hdr = ("| op | input rows | input MB | shuffle MB | shuffle rows | ratio "
       "| 100 TB shuffle | partitions @200MiB |")
sep = "|---|---|---|---|---|---|---|---|"
if big:
    hdr += " ratio sf0.1 | stability |"
    sep += "---|---|"
lines.append(hdr)
lines.append(sep)

for op, m in base["ops"].items():
    ib, sb = m["input_bytes"], m["shuffle_write_bytes"]
    ratio = sb / ib if ib else 0.0
    shuffle_100tb = ratio * TARGET_BYTES
    parts = max(1, int(shuffle_100tb / PARTITION_TARGET))
    row = (f"| {op} | {m['input_rows']:,} | {ib/1e6:.1f} | {sb/1e6:.2f} "
           f"| {m['shuffle_write_records']:,} | {ratio:.3f} "
           f"| {shuffle_100tb/1e12:.1f} TB | {parts:,} |")
    if big:
        sm = small["ops"].get(op)
        if sm and sm["input_bytes"] and sm["shuffle_write_bytes"]:
            r_small = sm["shuffle_write_bytes"] / sm["input_bytes"]
            stab = ratio / r_small if r_small else float("inf")
            row += f" {r_small:.3f} | {stab:.2f}x |"
        else:
            row += " — | — |"
    lines.append(row)

lines.append("")
lines.append("Reading the sheet:")
lines.append(
    "- `ratio` < 1: the operator moves less than it reads (hash-led dedup "
    "keys, map-side combine, broadcast-pruned joins doing their job). "
    "`ratio` > 1 flags amplification (exploded shingles/bands crossing an "
    "exchange) — acceptable only when the amplified rows are narrow "
    "(8-16 byte keys), which the `shuffle rows` column makes checkable.")
lines.append(
    "- Partition counts are per-STAGE totals at 100 TB input; a real cluster "
    "sets `spark.sql.shuffle.partitions` near the max row and lets AQE "
    "coalesce the smaller exchanges.")
lines.append(
    "- Ratios are measured on the engine's own plans at the stated scale; "
    "operators whose small-scale plans broadcast (tiny dims) will shuffle "
    "more at scales where the build side outgrows the broadcast threshold — "
    "the stability column across sf0.1→sf1 is the guard for that.")

open(out_path, "w").write("\n".join(lines) + "\n")
print(f"wrote {out_path} ({len(base['ops'])} ops)")
