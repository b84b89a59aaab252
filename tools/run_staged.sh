#!/usr/bin/env bash
# Run a graft main class off a STAGED jar copy under tmp/stage/, immune
# to concurrent recompiles: the round-12 driver bench lost a 19-query
# contiguous alphabetical block because `sbt compile` rewrote
# target/classes under the running JVM (the hazard bench_smoke.sh
# documents). A jar is ONE file the JVM holds open; staging a private
# copy under tmp/ means neither `sbt compile` (touches target/classes
# only) nor `sbt package` (rewrites target/scala-2.13/*.jar) can
# clobber a running record producer.
#
# Usage: tools/run_staged.sh [--build] <MainClass> [args...]
#   --build (or STAGE_BUILD=1): refresh the staged jar via sbt package
#   first. Without it an existing staged jar is reused (so parallel
#   invocations never trigger concurrent sbt builds).
#
# JVM flags mirror build.sbt's run settings (JDK-17 add-opens +
# SPARK_DRIVER_MEM heap).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p tmp/stage

BUILD="${STAGE_BUILD:-0}"
if [[ "${1:-}" == "--build" ]]; then BUILD=1; shift; fi

JAR=tmp/stage/graft.jar
if [[ "$BUILD" == 1 || ! -f "$JAR" ]]; then
  echo "[stage] sbt package -> $JAR" >&2
  sbt -batch package >&2
  SRC=$(ls target/scala-2.13/*.jar | head -1)
  # copy-then-rename: a reader of the OLD staged jar keeps its open
  # inode; a concurrent run_staged never sees a half-written file
  cp "$SRC" "$JAR.tmp.$$" && mv "$JAR.tmp.$$" "$JAR"
fi

# no main class: stage-only invocation
[[ $# -eq 0 ]] && exit 0

ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs
  java.base/sun.security.action java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done

exec java "${OPENS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" "$@"
