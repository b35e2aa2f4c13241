#!/usr/bin/env bash
# Snapshot preflight: prove the COMMITTED tree compiles (main + test) from
# a clean checkout — round 7's artifacts were zeroed by a snapshot whose
# working tree compiled but whose committed state did not. Run this before
# ending a round (and after any commit you won't follow with a test run).
#
# Usage: tools/preflight.sh [ref]   (default: HEAD)
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
