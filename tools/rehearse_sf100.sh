#!/bin/bash
# Third-decade (1000x driver sf0.1 = sf100, ~17 GB) scale rehearsal.
#
# Generates data/sf100 by composing GenScale over data/sf10 (copies=10,
# strideMult=10 — see GenScale scaladoc: second-pass effective copy ids
# 0,10,…,90 land in the key/seed range the first pass left free), then
# times a representative scale-path query per family with graft.TimeQ
# (3 runs each; run1 of index-backed queries includes the one-time index
# build for the new sfDir, runs 2-3 are the steady-state query path).
#
# Run this ONLY with the machine otherwise quiet (the bench-sequencing
# lesson from SURVEY §12). Usage: tools/rehearse_sf100.sh [queries...]
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

# Provenance-checked (manifest written by GenScale): a dir built before the
# stride-mult fix (mult=10 → ~80% key collisions) must not silently persist.
# mult = the PRODUCT of all prior pass copy counts (sf10's effective copy
# ids span 0..99), not the last pass's copies.
if ! { [ -f data/sf100/manifest.json ] \
    && grep -q '"copies":10,' data/sf100/manifest.json \
    && grep -q '"strideMult":100[,}]' data/sf100/manifest.json; }; then
  echo "[rehearse] data/sf100 manifest missing/stale — regenerating (copies=10, mult=100)"
  rm -rf data/sf100
  GRAFT_SCALE_SRC=data/sf10 GRAFT_SCALE_DST=data/sf100 \
  GRAFT_SCALE_COPIES=10 GRAFT_SCALE_STRIDE_MULT=100 \
    "${JVM[@]}" graft.GenScale
fi

# One scale-path representative per family; O(n^2) exact-oracle baselines
# are intentionally absent (declared quadratic — their LSH twins are here).
QUERIES=${*:-"q1_agg q5_multijoin q_topk_per_group q_sessionize \
dedup_exact dedup_minhash_lsh dedup_embedding_lsh dedup_decontaminate_bloom \
dedup_incremental \
ann_lsh ann_ivfpq_query_full corpus_assign \
text_tokens text_search_indexed text_tfidf corpus_heavy_hitters \
corpus_bpe_tokenize corpus_pagerank corpus_classifier_filter \
stream_window_agg stream_heavy_hitters"}

# Raw per-run evidence appends to rehearse_sf100.jsonl (committed with the
# SURVEY table); a marathon that dies mid-run keeps every completed number.
SPARK_GRAFT_SF_DIR=data/sf100 \
SPARK_GRAFT_TIMEQ_OUT=${SPARK_GRAFT_TIMEQ_OUT:-rehearse_sf100.jsonl} \
  "${JVM[@]}" graft.TimeQ $QUERIES
