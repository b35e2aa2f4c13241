#!/usr/bin/env bash
# Snapshot preflight: prove the COMMITTED tree compiles (main + test) from
# a clean checkout — round 7's artifacts were zeroed by a snapshot whose
# working tree compiled but whose committed state did not — AND that the
# full sf0.01 oracle passes TWICE under different partition layouts
# (CPUS=4 and CPUS=32), so summation-order-sensitive float parity (the
# round-9 flake class) is caught before the snapshot, not by the driver.
# check_oracle.py is signbit-aware since round 11 (and Verify canonicalizes
# -0.0 on both compare sides), so the round-10 sign-of-zero class is also
# locally visible. Run this before ending a round.
#
# Usage: tools/preflight.sh [ref]           (default: HEAD)
#        PREFLIGHT_SKIP_ORACLE=1 tools/preflight.sh   (compile check only)
set -euo pipefail

ref="${1:-HEAD}"
repo="$(cd "$(dirname "$0")/.." && pwd)"
work="$(mktemp -d /tmp/graft_preflight.XXXXXX)"
trap 'rm -rf "$work"' EXIT

echo "[preflight] exporting $ref to $work"
git -C "$repo" archive "$ref" | tar -x -C "$work"

echo "[preflight] sbt Test/compile from clean export"
(cd "$work" && sbt -batch "Test/compile" > "$work/compile.log" 2>&1) || {
  tail -40 "$work/compile.log"
  echo "[preflight] FAIL: $ref does not compile from clean" >&2
  exit 1
}
echo "[preflight] OK: $ref compiles (main + test) from a clean export"

if [[ "${PREFLIGHT_SKIP_ORACLE:-0}" != "1" ]]; then
  sf="${PREFLIGHT_SF_DIR:-/root/testdata/sf0.01}"
  for cpus in 4 32; do
    echo "[preflight] full oracle at $sf with SPARK_GRAFT_CPUS=$cpus"
    (cd "$work" && SPARK_GRAFT_CPUS=$cpus \
       sbt -batch "runMain graft.Verify $sf $work/v$cpus" \
       > "$work/verify$cpus.log" 2>&1) || {
      tail -20 "$work/verify$cpus.log"
      echo "[preflight] FAIL: Verify run (CPUS=$cpus)" >&2
      exit 1
    }
    python3 "$work/tools/check_oracle.py" "$work/v$cpus" "$sf" \
      > "$work/oracle$cpus.log" 2>&1 || {
      grep -v "^OK" "$work/oracle$cpus.log" | tail -20
      echo "[preflight] FAIL: oracle compare (CPUS=$cpus)" >&2
      exit 1
    }
    tail -2 "$work/oracle$cpus.log"
  done
  echo "[preflight] OK: full oracle green under both partition layouts"
fi
