#!/bin/bash
# Direct-java launcher for graft mains (skips sbt startup + build lock).
# Usage: tools/runjava.sh <mainClass> [args...]   (env: SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM)
REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ -z "$1" ]; then
  echo "usage: tools/runjava.sh <mainClass> [args...]" >&2
  exit 2
fi
MAIN=$1; shift
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens $p=ALL-UNNAMED"; done
exec java $FLAGS $JAVA_EXTRA -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dderby.stream.error.file=/tmp/derby.log \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
