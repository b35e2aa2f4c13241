#!/usr/bin/env bash
# Full-surface sf1 correctness sweep — the committed recipe behind the
# BASELINE.md sweep records.
#
#   1. build the 10x replica        tools/build_sf1.py   (-> /tmp/sf1)
#   2. dump every query             graft.Verify /tmp/sf1 <out>
#   3. exact DuckDB compare         tools/check_oracle.py over the FULL
#      surface — since round 12 the six window-calculus oracles replay
#      their cumulative folds with O(n)-memory block-carry recursive CTEs
#      (bit-exact), so they run unbounded in the strict gate like every
#      other query (tools/check_window_sf1.py remains as a diagnostic).
#
# Usage: run_sf1_sweep.sh [sf1_dir] [out_dir]
set -euo pipefail
SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/v_sf1_full}
cd "$(dirname "$0")/.."

[ -d "$SF1" ] || python3 tools/build_sf1.py /root/testdata/sf0.1 "$SF1" 10

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt -batch "runMain graft.Verify $SF1 $OUT"

DUCKDB_MEM=${DUCKDB_MEM:-32GB} python3 tools/check_oracle.py "$OUT" "$SF1"
