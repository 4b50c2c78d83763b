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
  -Dspark.cleaner.referenceTracking.blocking.shuffle=true
  -Dspark.sql.session.timeZone=UTC -Xmx48g -cp "$CP")

# A corpus is valid only when its provenance manifest matches the expected
# generation parameters — a dir generated before a GenScale fix (e.g. the
# strideMult=10 key-collision bug) must NOT silently persist and invalidate
# every number measured on it. Missing or mismatched manifest → regenerate.
manifest_ok() { # dir copies strideMult
  local m="$1/manifest.json"
  [ -f "$m" ] || return 1
  grep -q "\"copies\":$2," "$m" && grep -q "\"strideMult\":$3[,}]" "$m"
}
gen() { # src dst copies strideMult
  if manifest_ok "$2" "$3" "$4"; then return 0; fi
  if [ -d "$2" ]; then
    echo "[gen_decades] $2 manifest missing/stale — regenerating"
    rm -rf "$2"
  fi
  GRAFT_SCALE_SRC="$1" GRAFT_SCALE_DST="$2" \
  GRAFT_SCALE_COPIES="$3" GRAFT_SCALE_STRIDE_MULT="$4" "${JVM[@]}" graft.GenScale
}
gen /root/testdata/sf0.1 data/sf1 10 1
gen data/sf1 data/sf10 10 10
gen data/sf10 data/sf100 10 100
echo "[gen_decades] done"
