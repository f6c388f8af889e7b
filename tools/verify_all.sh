#!/usr/bin/env bash
# Full verify recipe — ONE command, four artifacts (under OUT_DIR, default
# verify_out/):
#   1. smoke_test.log        `sbt compile + test` (unit/integration suites)
#   2. correctness.json      graft.Verify dump vs DuckDB oracle (compare_oracle.py)
#   3. bench.json            isolated fresh-JVM bench (tools/run_bench.sh)
#   4. leakcheck.json        grep-based proprietary-token sweep over src/
# Usage: tools/verify_all.sh [out_dir] [verify_sf_dir] [bench_sf_dir]
# Stops at the first failing stage (set -e); partial artifacts stay on disk.
# On success the artifact set is also archived to verify_out/$GRAFT_ROUND/
# (REQUIRED env — no default) so a later harness re-run over OUT_DIR can't
# clobber the committed round record (the r8 working-tree BENCH overwrite).
set -euo pipefail
OUT_DIR="$(realpath -m "${1:-verify_out}")"
# GRAFT_ROUND is REQUIRED: a hardcoded default silently overwrote a prior
# round's committed archive once GRAFT_ROUND was forgotten — exactly the
# clobbering the archive step exists to prevent. Fail loudly instead.
[ -n "${GRAFT_ROUND:-}" ] || {
  echo "[verify_all] FATAL: export GRAFT_ROUND=rN (archive dir suffix) first" >&2
  exit 2
}
ROUND="$GRAFT_ROUND"
cd "$(dirname "$0")/.."
VSF="${2:-/root/testdata/sf0.01}"
BSF="${3:-/root/testdata/sf0.1}"
mkdir -p "$OUT_DIR"

echo "[verify_all] 1/4 smoke: sbt compile + test -> $OUT_DIR/smoke_test.log"
sbt -batch compile test >"$OUT_DIR/smoke_test.log" 2>&1 || {
  tail -40 "$OUT_DIR/smoke_test.log"; echo "[verify_all] SMOKE FAILED"; exit 1; }
tail -4 "$OUT_DIR/smoke_test.log"

echo "[verify_all] 2/4 correctness: Verify dump @ $VSF vs DuckDB oracle"
DUMP_DIR="$OUT_DIR/verify_dump"
rm -rf "$DUMP_DIR"
sbt -batch "runMain graft.Verify $VSF $DUMP_DIR" >"$OUT_DIR/verify_run.log" 2>&1 || {
  tail -40 "$OUT_DIR/verify_run.log"; echo "[verify_all] VERIFY RUN FAILED"; exit 1; }
python3 tools/compare_oracle.py "$DUMP_DIR" "$VSF" "$OUT_DIR/correctness.json" || {
  echo "[verify_all] CORRECTNESS FAILED"; exit 1; }

echo "[verify_all] 3/4 bench: isolated fresh-JVM run @ $BSF"
tools/run_bench.sh "$OUT_DIR/bench.json" "$BSF" 2>"$OUT_DIR/bench.stderr"

echo "[verify_all] 4/4 leakcheck: token sweep over src/"
python3 - "$OUT_DIR/leakcheck.json" <<'EOF'
import json, re, subprocess, sys
# Categories mirror the driver's LEAKCHECK gate: anything matching would mean
# non-public tokens leaked into the source tree.
pats = {
    "internal-import": r"import\s+(com|io)\.(anthropic|anthropicinternal)",
    # require a URL scheme: bare dotted names would false-positive on public
    # JVM package paths like org.apache.spark.internal
    "internal-url": r"https?://[a-z0-9.-]+\.(corp|internal)\b",
    "internal-bucket": r"s3://[a-z0-9-]*(internal|corp|private)[a-z0-9-]*",
    "slack-link": r"slack\.com/archives|#[a-z0-9-]*-(internal|eng)\b",
    "api-key": r"(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})",
}
hits = {k: [] for k in pats}
files = subprocess.run(["git", "ls-files", "src", "tools", "build.sbt"],
                       capture_output=True, text=True).stdout.split()
for f in files:
    try:
        text = open(f, encoding="utf-8", errors="replace").read()
    except OSError:
        continue
    for k, p in pats.items():
        for m in re.finditer(p, text):
            hits[k].append(f"{f}: {m.group(0)[:60]}")
n = sum(len(v) for v in hits.values())
json.dump({"n_hits": n, "hits": hits}, open(sys.argv[1], "w"), indent=2)
print(f"[verify_all] leakcheck hits: {n}")
sys.exit(1 if n else 0)
EOF

ARCHIVE="$(cd "$(dirname "$0")/.." && pwd)/verify_out/$ROUND"
mkdir -p "$ARCHIVE"
cp -f "$OUT_DIR/correctness.json" "$OUT_DIR/bench.json" \
      "$OUT_DIR/leakcheck.json" "$ARCHIVE/" 2>/dev/null || true
cp -f "$OUT_DIR/smoke_test.log" "$ARCHIVE/" 2>/dev/null || true
echo "[verify_all] OK — artifacts in $OUT_DIR (archived to $ARCHIVE)"
