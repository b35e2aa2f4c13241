#!/usr/bin/env bash
# Chunked sf10 Verify dump (round-13): one fresh JVM per ~30 queries —
# a single JVM degrades after ~90 sf10 queries (accumulated
# localCheckpoint blocks push the old gen; round-13 ops lesson in
# BASELINE.md). Queries whose DuckDB replays are the slow lane are
# dumped FIRST so the trailing checker (tools/sweep_sf10.sh) can start
# on them immediately.
#
# Usage: run_sf10_dump.sh <sf10_dir> <out_dir> <query_list_file> [chunk]
set -uo pipefail
SF=${1:?sf10 dir}; OUT=${2:?out dir}; LIST=${3:?query list}; CHUNK=${4:-30}
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
mkdir -p "$OUT"
mapfile -t ALL < "$LIST"
# skip queries already dumped (rerunnable)
TODO=()
for q in "${ALL[@]}"; do
  if [ -e "$OUT/$q/_SUCCESS" ] || [ -e "${OUT%/}.local/$q/_SUCCESS" ]; then
    continue
  fi
  TODO+=("$q")
done
echo "${#TODO[@]} queries to dump (of ${#ALL[@]})"
i=0
while [ $i -lt ${#TODO[@]} ]; do
  batch=("${TODO[@]:$i:$CHUNK}")
  names=$(IFS=,; echo "${batch[*]}")
  echo "=== chunk at $i: ${batch[0]} .. ${batch[-1]} ($(date +%T))"
  # DUMP_PARTS: without it the dump's coalesce(1) collapses each query's
  # whole plan into one task (quadratic pair joins ran single-core)
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-28} SPARK_GRAFT_ONLY="$names" \
    SPARK_GRAFT_DUMP_PARTS=${SPARK_GRAFT_DUMP_PARTS:-16} \
    java -Xmx48g $OPENS -cp "$CP" graft.Verify "$SF" "$OUT" \
    2>&1 | grep -E "\[verify\]|Error|Exception" | head -20
  i=$((i + CHUNK))
done
echo "dump done: $(ls "$OUT" | wc -l) entries ($(date +%T))"
