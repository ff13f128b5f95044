#!/usr/bin/env bash
# North-rule launch evidence: run the packaged pipeline via spark-submit on
# two multi-executor cluster sizes (N and 4N single-core executors — the
# sandbox stand-in for N -> 4N cluster nodes; each executor is its own JVM
# with its own heap, GC and shuffle server) and report wall times.
#
# Usage: scripts/spark_submit_scaling.sh [sfDir] [N] [memMbPerExec]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
N="${2:-2}"
MEM="${3:-3072}"
N4=$((N * 4))
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION=2.13

sbt -batch package > /dev/null
JAR="$(ls target/scala-2.13/*.jar | grep -v -- -tests | head -1)"
echo "jar: $JAR"

run() {
  local execs="$1" work="$2"
  rm -rf "$work"
  local t0 t1
  t0=$(date +%s.%N)
  "$SPARK_HOME/bin/spark-submit" \
    --class graft.Pipeline \
    --master "local-cluster[$execs,1,$MEM]" \
    --conf spark.sql.shuffle.partitions="$execs" \
    --conf spark.ui.enabled=false \
    "$JAR" "$SF_DIR" "$work" 2>/dev/null | grep '"pipeline"'
  t1=$(date +%s.%N)
  echo "executors=$execs wall_sec=$(awk -v a="$t0" -v b="$t1" 'BEGIN{printf "%.1f", b-a}')"
}

echo "== spark-submit local-cluster[$N,1,$MEM] =="
run "$N" /tmp/submit_work_n
echo "== spark-submit local-cluster[$N4,1,$MEM] =="
run "$N4" /tmp/submit_work_4n
