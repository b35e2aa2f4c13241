#!/usr/bin/env bash
# Incremental strict sf10 sweep (round-13 verdict #2): as graft.Verify
# fills <dump_dir>, check each completed query against DuckDB one at a
# time with a per-query timeout, recording OK/FAIL/TIMEOUT lines to the
# results file. Rerunnable: already-recorded queries are skipped, so the
# sweep can trail the Verify run and resume after interruptions.
#
# The oracle SQL is taken from a COMPLETE previous Verify dump (the
# sf0.01 run) because a resumed sf10 Verify only re-wraps the queries it
# re-ran; the wrapped SQL depends only on the query schema, which is
# scale-invariant.
#
# Usage: sweep_sf10.sh <dump_dir> <sf_dir> <oracle_src_dir> <results_file> [per_query_timeout_s]
set -uo pipefail
DUMP=${1:?dump dir}; SF=${2:?sf dir}; ORACLES=${3:?oracle src dir}
RESULTS=${4:?results file}; TMO=${5:-420}
CHECK=$(mktemp -d /tmp/sweepchk.XXXX)
cp "$ORACLES/oracle_sql.json" "$CHECK/" 2>/dev/null
# local fixtures + their oracle SQL live in the sibling <dump>.local dir
# (driver-invisible, r14); symlink it as the checker outdir's sibling too
mkdir -p "$CHECK.local"
cp "${ORACLES%/}.local/local_oracle_sql.json" "$CHECK.local/" 2>/dev/null \
  || cp "$ORACLES/local_oracle_sql.json" "$CHECK.local/" 2>/dev/null
if [ -d "${DUMP%/}.local" ]; then
  for d in "${DUMP%/}.local"/*/; do
    [ -d "$d" ] && ln -sfn "${d%/}" "$CHECK.local/$(basename "$d")"
  done
fi
touch "$RESULTS"
cd "$(dirname "$0")/.."
for q in $( { ls "$DUMP" 2>/dev/null; ls "${DUMP%/}.local" 2>/dev/null; } | sort -u ); do
  base="$DUMP"; [ -d "$DUMP/$q" ] || base="${DUMP%/}.local"
  [ -d "$base/$q" ] || continue
  [ -e "$base/$q/_SUCCESS" ] || continue
  grep -q "^$q " "$RESULTS" && continue
  [ "$base" = "$DUMP" ] && ln -sfn "$DUMP/$q" "$CHECK/$q"
  # -s KILL: DuckDB's native execution loop defers Python-level SIGTERM
  # indefinitely (a training-loop CTE ran 2x past the cap before the
  # round-13 fix), so the cap must be un-ignorable
  out=$(DUCKDB_MEM=${DUCKDB_MEM:-32GB} timeout -s KILL "$TMO" \
        python3 tools/check_oracle.py "$CHECK" "$SF" "$q" 2>&1)
  rc=$?
  if [ $rc -eq 124 ] || [ $rc -eq 137 ]; then
    echo "$q TIMEOUT ${TMO}s" >> "$RESULTS"
  elif echo "$out" | grep -q "^OK    $q"; then
    echo "$q OK" >> "$RESULTS"
  elif echo "$out" | grep -q "1/1 pass"; then
    echo "$q OK" >> "$RESULTS"
  elif echo "$out" | grep -q "no spark output"; then
    : # dumped dir incomplete/renamed — retry next pass
  elif echo "$out" | grep -q "0/0 pass\|no_oracle\|KeyError"; then
    echo "$q NO_ORACLE" >> "$RESULTS" # rows-only in the driver gate too
  else
    msg=$(echo "$out" | grep "^FAIL" | head -1)
    echo "$q FAIL ${msg:-unknown}" >> "$RESULTS"
  fi
  tail -1 "$RESULTS"
done
rm -rf "$CHECK"
echo "sweep pass done: $(grep -c ' OK$' "$RESULTS") OK / $(wc -l < "$RESULTS") recorded"
