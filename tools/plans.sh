#!/usr/bin/env bash
# Regenerate PLANS.md from the FULL query registry (PlanDump with no
# args = every SparkEntry.queries key minus PlanDump.excluded), then
# assert the section count matches the registry so a query can never
# silently lack a plan record again.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "runMain graft.PlanDump" > PLANS.md

# sbt prefixes program stdout with "[info] " — match the marker anywhere
# on the line but require the full ====== name ====== shape
SECTIONS=$(grep -c '========== [a-z0-9_]* ==========$' PLANS.md)
REGISTRY=$(grep -o 'registry_size=[0-9]*' PLANS.md | head -1 | cut -d= -f2 || true)
echo "[plans] ${SECTIONS} plan sections written to PLANS.md"
if [ -n "${REGISTRY:-}" ] && [ "$SECTIONS" != "$REGISTRY" ]; then
  echo "[plans] FAIL: $SECTIONS sections != $REGISTRY registered queries"
  exit 1
fi
