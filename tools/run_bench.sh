#!/usr/bin/env bash
# Isolated bench run: launches graft.Bench in a fresh plain-java JVM (no sbt
# in the measurement process, no concurrent compile). Compile first with
# `sbt compile`. Usage: tools/run_bench.sh [out.json] [sf_dir]
# Env: SPARK_GRAFT_CLASSES overrides the classes dir (e.g. a snapshot copy so
# a concurrent `sbt compile` can't mutate bytecode under the measured JVM);
# SPARK_DRIVER_MEM overrides -Xmx (default 32g).
set -euo pipefail
# Resolve OUT against the caller's cwd BEFORE cd'ing to the repo root, so a
# relative path lands where the caller expects.
OUT="$(realpath -m "${1:-BENCH_LAST.json}")"
cd "$(dirname "$0")/.."
SF="${2:-/root/testdata/sf0.1}"
CLASSES="${SPARK_GRAFT_CLASSES:-target/scala-2.13/classes}"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 2; }
# Keep this package list in sync with jdk17AddOpens in build.sbt (the sbt-side
# copy is what `sbt test` forks with; this is the plain-java equivalent).
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
