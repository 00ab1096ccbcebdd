#!/bin/bash
# Run a graft main from the /tmp/classes_snap SNAPSHOT classpath (same
# JVM flags as tools/run_main.sh): long-running background JVMs keep a
# stable view of the classes while foreground `sbt compile` rewrites
# target/scala-2.13/classes underneath them. Produce the snapshot after
# a green compile with:
#   rm -rf /tmp/classes_snap && cp -r target/scala-2.13/classes /tmp/classes_snap
# Usage:
#   tools/run_snap_local.sh graft.Bench
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR,
#      SNAP_CLASSES (override the snapshot dir, default /tmp/classes_snap).
set -euo pipefail
cd "$(dirname "$0")/.."
SNAP="${SNAP_CLASSES:-/tmp/classes_snap}"
[ -d "$SNAP" ] || { echo "snapshot dir $SNAP missing — see header" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$@"
