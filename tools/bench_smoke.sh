#!/usr/bin/env bash
# Kill-resilience smoke for the bench record (round-11 lesson: the
# driver's bench was timeout-killed mid-probe and recorded NOTHING —
# now the main loop runs first and the record flushes after every
# query, so a kill at ANY point past the first query leaves a
# parseable bench_total.json).
#
# Runs the full bench at a tiny SF with an unfinishable rep count under
# `timeout`, then asserts:
#   1. bench_total.json parses,
#   2. every registered query was attempted (pass 1 completed),
#   3. every attempted query carries >= 1 successful rep.
#
# Usage: tools/bench_smoke.sh [sf_dir] [timeout_s]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
T="${2:-900}"
mkdir -p tmp
rm -f bench_total.json bench_detail.json

echo "[smoke] staging jar, then timeout $T graft.Bench @ $SF (REPS=30 — unfinishable)"
STAGE_BUILD=1 tools/run_staged.sh
# prove recompile-immunity: a compile loop hammers target/classes for
# the whole smoke — the round-12 driver bench lost a 19-query block to
# exactly this; the staged jar must not care
( while :; do touch src/main/scala/graft/Bench.scala 2>/dev/null; \
    sbt -batch compile >/dev/null 2>&1 || true; done ) &
COMPILE_LOOP=$!
trap 'kill $COMPILE_LOOP 2>/dev/null || true' EXIT
set +e
timeout "$T" env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REPS=30 \
  SPARK_GRAFT_TIME_BUDGET_S=0 \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  tools/run_staged.sh graft.Bench >tmp/bench_smoke.out 2>tmp/bench_smoke.err
rc=$?
set -e
kill $COMPILE_LOOP 2>/dev/null || true
echo "[smoke] bench exited rc=$rc (124 = killed by timeout, the point)"

# sbt forwards the forked program's stderr to ITS stdout tagged
# [error], so the registered line lands in the .out capture
REGISTERED=$(grep -o '[0-9]* queries registered' tmp/bench_smoke.out \
  tmp/bench_smoke.err 2>/dev/null | head -1 | grep -o '[0-9]*' || true)
echo "[smoke] registry size from bench log: ${REGISTERED:-unknown}"

python3 - "$REGISTERED" <<'EOF'
import json, sys
registered = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] else None
d = json.load(open('bench_total.json'))
t = d['totals']
qmin = d['queries_min']
with_rep = sum(1 for v in qmin.values() if v is not None)
print(f"[smoke] bench_total.json parses: n_queries={t['n_queries']}, "
      f">=1 successful rep: {with_rep}, total_min={t['total_min']}, "
      f"n_errors={t['n_errors']}")
assert t['n_queries'] == len(qmin), "totals/queries_min disagree"
assert with_rep == len(qmin), \
    f"{len(qmin) - with_rep} attempted queries have zero successful reps"
# the smoke runs a parallel sbt-compile loop on purpose: the staged
# jar makes the round-12 recompile-clobber failure (a contiguous
# alphabetical block of failed reps) impossible, and zero errors
# here proves it
assert t['n_errors'] == 0, f"{t['n_errors']} queries had a failed rep"
if registered is not None:
    assert t['n_queries'] == registered, \
        f"pass 1 incomplete: {t['n_queries']}/{registered} attempted " \
        "(raise the timeout or shrink the SF)"
print("[smoke] PASS: a timeout-killed bench still leaves a full pass-1 record")
EOF
