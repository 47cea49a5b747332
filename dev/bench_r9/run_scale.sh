#!/bin/bash
# r9 scale-curve re-measure (VERDICT r8 next-#5): dedup + graph families
# (plus doc-sim) on the Heaps-law corpora, post r9 fixes (weighted
# simhash, streaming state sizing landed earlier this round; graph
# persists landed r8-post-table). graft.Time medians (3 reps, min shown
# as median-of-3 steady state), quiet box required.
# Usage: dev/bench_r9/run_scale.sh [gen01dir] [gen1dir]
set -e
G01=${1:-/tmp/gen/heaps0.1}
G1=${2:-/tmp/gen/heaps1}
QUERIES="q_dedup_ngram q_dedup_groups q_dedup_canonical q_minhash_dup q_simhash_dup q_substring_dedup q_doc_sim_sparse q_pagerank_iter q_pagerank3 q_triangles q_degree_dist"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for dir in "$G01" "$G1"; do
  echo "=== $dir ==="
  java $ADDOPENS -Xmx24g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Time "$dir" 3 -w $QUERIES
done
