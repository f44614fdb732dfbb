#!/bin/bash
# Dev loop: compile, run graft.Verify on a scale factor, diff vs DuckDB.
# Usage: tools/verify.sh [sf0.01] [outdir]
set -e
cd "$(dirname "$0")/.."
SF=${1:-sf0.01}
OUT=${2:-/tmp/verify_$SF}
sbt -batch -error package
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
java $ADD_OPENS -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/obadiahspark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.Verify "/root/testdata/$SF" "$OUT" ${3:+"$3"}
# self-evidencing gate log: the driver's correctness capture has come
# back empty twice (r08, r12) — append every full-suite check summary
# to a committed artifact so the repo itself records the gate result
set -o pipefail
CHECK_LOG=$(mktemp)
RC=0
python3 tools/check.py "$OUT" "/root/testdata/$SF" | tee "$CHECK_LOG" || RC=$?
if [ -z "${3:-}" ]; then
  mkdir -p docs/verify
  SUMMARY=$(grep -E '^== .* ==$' "$CHECK_LOG" | tail -1)
  echo "$(date -u +%Y-%m-%dT%H:%M:%SZ) sha=$(git rev-parse --short HEAD) sf=$SF $SUMMARY" >> docs/verify/gate_log.txt
fi
rm -f "$CHECK_LOG"
exit $RC
