#!/bin/bash
# Run a graft main (Bench/Verify/Probe) against the compiled classes
# WITHOUT sbt, so measurement runs don't contend for the sbt project
# lock while sources are being edited/compiled. Mirrors build.sbt's
# forked-run JVM flags (JDK17 add-opens, UTC, no UI, 16g heap).
# Usage: tools/run_main.sh graft.Bench [args...]
set -u
CLASSES=/root/repo/target/scala-2.13/classes
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
