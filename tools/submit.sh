#!/usr/bin/env bash
# North-star packaging path: run the benchmark (or any graft main) under
# a REAL spark-submit instead of `sbt runMain` — the same jar + command
# shape a multi-executor cluster would use (only --master changes).
#
# Spark's jars are already on the driver/executor classpath
# (/opt/spark/jars), so plain `sbt package` suffices — no assembly.
#
# Usage: tools/submit.sh [mainClass] [master]
#   tools/submit.sh                      # graft.Bench on local[32]
#   tools/submit.sh graft.Scaling        # scaling probe
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 tools/submit.sh
set -euo pipefail
cd "$(dirname "$0")/.."

MAIN="${1:-graft.Bench}"
MASTER="${2:-local[${SPARK_GRAFT_CPUS:-32}]}"

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/ncitsemanticmapperspark_*.jar | grep -v -- -tests | head -1)

exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --class "$MAIN" \
  --driver-memory "${SPARK_DRIVER_MEM:-64g}" \
  --driver-java-options "-Xms${SPARK_DRIVER_MEM:-64g} -XX:+UseTransparentHugePages -XX:+AlwaysPreTouch" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.GraftExtensions \
  "$JAR"
