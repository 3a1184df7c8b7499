#!/bin/bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (no launcher lock, no build overhead) — for measurement runs
# that must not contend with or wait on an sbt invocation. Replicates the
# javaOptions from build.sbt (JDK17 add-opens, vector BLAS, UTC, heap).
# Usage: tools/runmain.sh graft.ScaleSweep [args...]
set -euo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  --add-modules=jdk.incubator.vector \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
