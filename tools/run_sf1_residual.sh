#!/bin/bash
# Drive the 21 heavy sf1 DuckDB oracles one at a time (cheapest first),
# merging verdicts into $ART so a kill loses at most one query's work.
set -u
ART=/root/repo/CORRECTNESS_r13_sf1_residual.json
OUT=/tmp/graft_verify_r13_sf1
SF=/root/repo/target/sf1
LOG=/tmp/sf1_residual.log
: > "$LOG"
QUERIES=(
  graph_triangles graph_label_prop
  graph_pagerank graph_pagerank_weighted graph_pagerank_inc graph_pagerank_stream
  vec_mmr ann_bruteforce vec_hard_negatives
)
for q in "${QUERIES[@]}"; do
  echo "=== $(date +%H:%M:%S) $q" >> "$LOG"
  SKIP_SPARK=1 DUCKDB_THREADS=${DUCKDB_THREADS:-16} DUCKDB_MEM=${DUCKDB_MEM:-40GB} ONLY="$q" \
    MERGE_JSON="$ART" CHECK_JSON="$ART" \
    python3 /root/repo/tools/check.py "$SF" "$OUT" >> "$LOG" 2>&1
done
echo "=== $(date +%H:%M:%S) ALL DONE" >> "$LOG"
