#!/usr/bin/env bash
# One-command correctness gate: Verify dump → DuckDB oracle compare →
# a CORRECTNESS record (driver per-query schema) at HEAD.
#
# Three consecutive rounds of empty driver-side CORRECTNESS_r{N}.json
# records made this reproducible path the de-facto gate; running it
# through one script removes any drift between builder / judge / driver
# invocations. Usage:
#
#   tools/gate.sh [sf_dir] [out_dir] [record] [query_filter]
#
# Defaults: /root/testdata/sf0.01, tmp/verify_gate, CORRECTNESS_SELF.json,
# all queries. `query_filter` is a comma-separated query-name list,
# forwarded to graft.Verify — the sf0.1 heavy-query tier runs
#   tools/gate.sh /root/testdata/sf0.1 tmp/verify_sf01 \
#     CORRECTNESS_SELF_SF01.json "corpus_prepare,graph_betweenness,..."
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-tmp/verify_gate}"
RECORD="${3:-CORRECTNESS_SELF.json}"
FILTER="${4:-}"

echo "[gate] verify dump: $SF_DIR -> $OUT_DIR (staged jar)"
# staged jar (round-12 lesson): a concurrent `sbt compile` rewriting
# target/classes under the running JVM failed a contiguous block of
# queries in the driver's record; the gate now runs off a private jar
# copy that no recompile can clobber. STAGE_BUILD=0 reuses the last
# staged jar (parallel gate tiers share one build).
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
STAGE_BUILD="${STAGE_BUILD:-1}" \
  tools/run_staged.sh graft.Verify "$SF_DIR" "$OUT_DIR" $FILTER

echo "[gate] duckdb oracle compare -> $RECORD"
# `|| rc=$?` keeps the script alive under set -e so the trailing
# record-written message and explicit exit run on BOTH paths (the old
# bare-invocation form skipped them whenever the compare failed).
rc=0
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR" "$RECORD" || rc=$?
echo "[gate] record written to $RECORD (exit $rc)"
exit $rc
