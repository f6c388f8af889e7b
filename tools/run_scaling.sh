#!/usr/bin/env bash
# Isolated scaling run: graft.Scaling in a fresh plain-java JVM (same launcher
# shape as run_bench.sh). Compile first with `sbt compile`.
# Usage: tools/run_scaling.sh [out.json] [sf_dir]
# Env: SPARK_GRAFT_CLASSES overrides the classes dir; SPARK_DRIVER_MEM -Xmx.
set -euo pipefail
OUT="$(realpath -m "${1:-SCALING_LAST.json}")"
cd "$(dirname "$0")/.."
SF="${2:-/root/testdata/sf0.01}"
CLASSES="${SPARK_GRAFT_CLASSES:-target/scala-2.13/classes}"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 2; }
# Keep this package list in sync with jdk17AddOpens in build.sbt.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_SCALING_OUT="$OUT" \
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Scaling
