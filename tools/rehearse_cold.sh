#!/bin/bash
# Cold-vs-warm IO rehearsal: every steady-state decade number is warm-page-
# cache compute (data/sf100 = 21 GB on a 128 GiB box), but the 100 TB story
# is cold IO — a 1000-executor cluster reads most bytes from storage, not
# cache. Per query this records, in rehearse-JSONL form:
#
#   1. caches dropped (sync; echo 3 > /proc/sys/vm/drop_caches), then ONE
#      fresh JVM, runs=3, tag="cold"  — run1 = cold-IO + fresh-JVM, runs
#      2-3 = same-JVM warm recovery
#   2. a second fresh JVM, runs=3, tag="warm" — run1 = fresh-JVM with warm
#      cache, so (cold run1 − warm run1) isolates the IO delta with the JIT
#      cost present in both
#
# Must run as root (drop_caches) and ALONE on the machine (§15.6).
# Usage: tools/rehearse_cold.sh <sfDir> <out.jsonl> <query> [query ...]
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
export SPARK_GRAFT_TIMEQ_RUNS=${SPARK_GRAFT_TIMEQ_RUNS:-3}

run_one() { # $1 = tag, $2 = query
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_TIMEQ_OUT="$OUT" \
  SPARK_GRAFT_TIMEQ_TAG="$1" \
    java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false \
    -Dspark.cleaner.referenceTracking.blocking.shuffle=true \
    -Dspark.sql.session.timeZone=UTC -Xmx48g -cp "$CP" \
    graft.TimeQ "$2"
}

for q in "$@"; do
  echo "[cold-rehearse] $q: dropping page cache"
  sync
  echo 3 > /proc/sys/vm/drop_caches
  echo "[cold-rehearse] $q cold JVM"
  run_one cold "$q"
  echo "[cold-rehearse] $q warm JVM"
  run_one warm "$q"
done
