#!/usr/bin/env bash
# Run a graft main directly from the packaged jar, bypassing the sbt
# lock (so benches can run while a long sbt job holds it). Replicates
# build.sbt's forked-run JVM options (JDK17 add-opens, UTC, no UI).
#
#   scripts/run_main.sh graft.Bench [args...]
#
# Env passthrough is the shell's own (SPARK_GRAFT_* etc.);
# SPARK_DRIVER_MEM sets -Xmx (default 8g). REBUILD THE JAR after any
# source change: sbt -batch package (this script does not).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
JAR=target/scala-2.13/polarsviewspark_2.13-0.1.0.jar
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/opt/spark/jars/*:$JAR" "$MAIN" "$@"
