#!/bin/bash
# Regenerate the decade corpora (data/sf1, data/sf10, data/sf100) from the
# driver testdata via GenScale composition. Idempotent: skips dirs that
# already exist. Safe to run alongside code reading, NOT alongside a bench.
set -euo pipefail
cd "$(dirname "$0")/.."

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
# GraftSession defaults to local[4] without this — a 4-core decade
# rehearsal measures the scheduler, not the engine
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
JVM=(java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC -Xmx48g -cp "$CP")

if [ ! -d data/sf1/lineitem.parquet ]; then
  GRAFT_SCALE_SRC=/root/testdata/sf0.1 GRAFT_SCALE_DST=data/sf1 \
  GRAFT_SCALE_COPIES=10 "${JVM[@]}" graft.GenScale
fi
if [ ! -d data/sf10/lineitem.parquet ]; then
  GRAFT_SCALE_SRC=data/sf1 GRAFT_SCALE_DST=data/sf10 \
  GRAFT_SCALE_COPIES=10 GRAFT_SCALE_STRIDE_MULT=10 "${JVM[@]}" graft.GenScale
fi
if [ ! -d data/sf100/lineitem.parquet ]; then
  GRAFT_SCALE_SRC=data/sf10 GRAFT_SCALE_DST=data/sf100 \
  GRAFT_SCALE_COPIES=10 GRAFT_SCALE_STRIDE_MULT=100 "${JVM[@]}" graft.GenScale
fi
echo "[gen_decades] done"
