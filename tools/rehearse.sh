#!/bin/bash
# Generic per-JVM decade rehearsal: ONE QUERY PER JVM (SURVEY §15.2 —
# marathon cross-query contamination is nondeterministic and can inflate
# a mid-list query 3-6x), appending raw per-run JSONL evidence.
#
# Usage: tools/rehearse.sh <sfDir> <out.jsonl> <query> [query ...]
# Env:   SPARK_GRAFT_TIMEQ_RUNS (default 3), GRAFT_STREAM_PROGRESS=1 to
#        log per-operator state rows (bounded-state evidence).
#
# Run ONLY with the machine otherwise quiet (benches run ALONE — §15.6).
set -euo pipefail
cd "$(dirname "$0")/.."

SFDIR=$1; OUT=$2; shift 2

ADD_OPENS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
)
CP="target/scala-2.13/classes:/opt/spark/jars/*"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

for q in "$@"; do
  echo "[rehearse] $q @ $SFDIR (one JVM)"
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_TIMEQ_OUT="$OUT" \
    java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false \
    -Dspark.cleaner.referenceTracking.blocking.shuffle=true \
    -Dspark.sql.session.timeZone=UTC -Xmx48g -cp "$CP" \
    graft.TimeQ "$q"
done
