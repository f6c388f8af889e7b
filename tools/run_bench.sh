#!/usr/bin/env bash
# Isolated bench run: launches graft.Bench in a fresh plain-java JVM (no sbt
# in the measurement process, no concurrent compile). Compile first with
# `sbt compile`. Usage: tools/run_bench.sh [out.json] [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_LAST.json}"
SF="${2:-/root/testdata/sf0.1}"
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 2; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" \
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
