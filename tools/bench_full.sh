#!/bin/bash
# Full-catalog bench launcher — the one command every decade artifact
# (bench_sf1.json, bench_sf10.json) is produced with, so the JVM flags,
# heap, and core count can never drift between runs.
#
# Usage: tools/bench_full.sh <sf-dir> <out.json> [runs] [once-csv] [skip-csv]
#   sf-dir   data directory (e.g. data/sf1)
#   out.json artifact path (e.g. bench_sf1.json)
#   runs     median-of-N runs per query (default 1 for decade artifacts)
#   once-csv queries measured with a single run regardless of `runs`
#            (the declared O(n^2) exact-oracle baselines at 100x)
#   skip-csv queries EXCLUDED from the artifact (recorded as "skipped" in
#            the JSON) — the declared quadratic baselines whose wall-clock
#            at sf100 is hours; their scale twins stay in the measured set
#
# Run ONLY with the machine otherwise quiet (SURVEY §12 bench-sequencing
# lesson): a concurrent JVM inflates every recorded median.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?usage: bench_full.sh <sf-dir> <out.json> [runs] [once-csv]}
OUT=${2:?usage: bench_full.sh <sf-dir> <out.json> [runs] [once-csv]}
RUNS=${3:-1}
ONCE=${4:-}
SKIP=${5:-}

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

SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_BENCH_RUNS="$RUNS" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
SPARK_GRAFT_BENCH_ONCE="$ONCE" \
SPARK_GRAFT_BENCH_SKIP="$SKIP" \
java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false \
  -Dspark.cleaner.referenceTracking.blocking.shuffle=true \
  -Dspark.sql.session.timeZone=UTC -Xmx48g -cp "$CP" graft.Bench
