#!/usr/bin/env bash
# One-command correctness gate: Verify dump at sf0.01 → DuckDB oracle
# compare → CORRECTNESS_SELF.json (driver per-query schema) at HEAD.
#
# Three consecutive rounds of empty driver-side CORRECTNESS_r{N}.json
# records made this reproducible path the de-facto gate; running it
# through one script removes any drift between builder / judge / driver
# invocations. Usage:
#
#   tools/gate.sh [sf_dir] [out_dir] [record]
#
# Defaults: /root/testdata/sf0.01, tmp/verify_gate, CORRECTNESS_SELF.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-tmp/verify_gate}"
RECORD="${3:-CORRECTNESS_SELF.json}"

echo "[gate] verify dump: $SF_DIR -> $OUT_DIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "[gate] duckdb oracle compare -> $RECORD"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR" "$RECORD"
rc=$?
echo "[gate] record written to $RECORD (exit $rc)"
exit $rc
