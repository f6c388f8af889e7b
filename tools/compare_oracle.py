#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run Verify's parquet dumps against
DuckDB oracle SQL on the same lake, compare schema/rows/values exactly.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [report.json]
"""
import json, sys, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
report_path = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
all_q = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
# Dev knob (driver CLI stays two/three positional args): COMPARE_ONLY=q1,q2
# restricts the run — used by compare_with_timeouts.py to give each oracle its
# own subprocess + wall cap at big scale factors.
only = {q for q in os.environ.get("COMPARE_ONLY", "").split(",") if q}
if only:
    all_q = [q for q in all_q if q in only]
fails = 0
def record(name, ok, **kw):
    report[name] = {"pass": ok, **kw}

# Approximate-by-design queries with a pinned recall FLOOR, active only when
# GRAFT_APPROX_RECALL=1 (verify_sf1.sh sets it for the sf1 campaign; the
# driver's sf0.01 gate and local sf0.1 runs stay strict-exact). Contract per
# query: engine rows must be a SUBSET of the oracle rows (zero false
# positives) and |engine| / |oracle| >= floor. d06's floor encodes the r8/r9
# measured multi-probe curve (probes=2 -> 0.986 at sf1): a banding/plane
# change that regresses recall below 0.98 fails the campaign instead of
# slipping through as "approximate anyway".
APPROX_RECALL = {"d06_embedding_neardup": 0.98}
approx_on = os.environ.get("GRAFT_APPROX_RECALL") == "1"

def approx_compare(name, g, w, gc):
    floor = APPROX_RECALL[name]
    got_rows = set(map(tuple, g[gc].astype(str).itertuples(index=False)))
    want_rows = set(map(tuple, w[gc].astype(str).itertuples(index=False)))
    false_pos = got_rows - want_rows
    recall = len(got_rows & want_rows) / max(1, len(want_rows))
    if false_pos:
        print(f"FAIL {name}: {len(false_pos)} rows not in oracle "
              f"(approximate contract allows misses, never extras)")
        record(name, False, mode="recall-floor", recall=round(recall, 4),
               err=f"{len(false_pos)} false positives")
        return False
    if recall < floor:
        print(f"FAIL {name}: recall {recall:.4f} < pinned floor {floor}")
        record(name, False, mode="recall-floor", recall=round(recall, 4),
               recall_floor=floor, err=f"recall below floor {floor}")
        return False
    print(f"OK   {name}: recall {recall:.4f} >= floor {floor}, "
          f"subset-of-oracle ({len(got_rows)}/{len(want_rows)} pairs)")
    record(name, True, mode="recall-floor", recall=round(recall, 4),
           recall_floor=floor, rows=len(got_rows), oracle_rows=len(want_rows))
    return True
for name in all_q:
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1
        record(name, False, err="no parquet output"); continue
    got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows, cols={list(got.columns)}")
        if len(got) == 0:
            print(f"  WARN {name}: zero rows")
        record(name, len(got) > 0, rows=len(got), mode="rows-only")
        continue
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        record(name, False, err=f"oracle error {e}"); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}"); fails += 1
        record(name, False, err=f"columns {gc} vs {wc}"); continue
    g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(wc, kind="mergesort").reset_index(drop=True)
    if approx_on and name in APPROX_RECALL:
        if not approx_compare(name, g, w, gc):
            fails += 1
        continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1
        record(name, False, err=f"rows {len(g)} vs {len(w)}"); continue
    # exact compare cell by cell (stringified to dodge dtype wrappers)
    mism = 0
    for c in gc:
        a, b = g[c].astype(str), w[c].astype(str)
        bad = (a != b)
        if bad.any():
            mism += int(bad.sum())
            i = bad.idxmax()
            print(f"  {name}.{c}: {int(bad.sum())} mismatches, e.g. row {i}: "
                  f"{a[i]!r} vs {b[i]!r} (dtypes {g[c].dtype}/{w[c].dtype})")
    if mism:
        print(f"FAIL {name}: {mism} cell mismatches"); fails += 1
        record(name, False, err=f"{mism} cell mismatches", rows=len(g))
    else:
        print(f"OK   {name}: {len(g)} rows x {len(gc)} cols exact match")
        record(name, True, rows=len(g), cols=len(gc))
missing = sorted(set(oracle) - set(all_q))
if missing:
    print(f"WARN: oracle entries with no output: {missing}")
print(f"\n{'PASS' if fails == 0 else 'FAIL'}: {len(all_q) - fails}/{len(all_q)} queries clean")
if report_path:
    json.dump({"sf_dir": sf_dir, "clean": fails == 0, "queries": report},
              open(report_path, "w"), indent=1)
    print("wrote", report_path)
sys.exit(1 if fails else 0)
