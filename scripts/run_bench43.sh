#!/usr/bin/env bash
# Run graft.Bench43 directly (no sbt) — classes must be compiled first.
# Usage: run_bench43.sh [generate]   env: HITS_ROWS HITS_PATH BENCH43_OUT SPARK_GRAFT_CPUS
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# EXTRA_OPTS: space-separated -Dspark.* system properties for A/B conf
# experiments (spark.* sysprops seed SparkConf; builder .config wins)
exec java $OPENS ${EXTRA_OPTS:-} -Xmx${SPARK_DRIVER_MEM:-24g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench43 "$@"
