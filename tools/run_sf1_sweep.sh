#!/usr/bin/env bash
# Full-surface sf1 correctness sweep — the committed recipe behind the
# BASELINE.md sweep records.
#
#   1. build the 10x replica        tools/build_sf1.py   (-> /tmp/sf1)
#   2. dump every query             graft.Verify /tmp/sf1 <out>
#   3. exact DuckDB compare         tools/check_oracle.py, EXCLUDING the 6
#      growing-frame window queries whose SQL replay is quadratic at 1M
#      events (list() OVER ROWS UNBOUNDED PRECEDING)
#   4. linear pandas replay of those 6   tools/check_window_sf1.py
#
# Usage: run_sf1_sweep.sh [sf1_dir] [out_dir]
set -euo pipefail
SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/v_sf1_full}
cd "$(dirname "$0")/.."

[ -d "$SF1" ] || python3 tools/build_sf1.py /root/testdata/sf0.1 "$SF1" 10

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt -batch "runMain graft.Verify $SF1 $OUT"

WINDOW_REPLAY="q_window_fill,q_window_stats,q_window_nfamily,q_window_calc,q_dynamic_window_nfamily,q_dynamic_window_calc"
EXACT=$(python3 - "$OUT" "$WINDOW_REPLAY" <<'EOF'
import json, sys
skip = set(sys.argv[2].split(","))
names = [n for n in json.load(open(f"{sys.argv[1]}/oracle_sql.json")) if n not in skip]
print(",".join(sorted(names)))
EOF
)
python3 tools/check_oracle.py "$OUT" "$SF1" "$EXACT"
python3 tools/check_window_sf1.py "$OUT" "$SF1"
