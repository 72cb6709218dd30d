#!/bin/bash
# Round-8 sf10 escalation, one JVM per query: an OOM/failure in one query
# cannot kill the batch, and wall time per query is recorded for SCALE.md.
# q_dedup_simhash_wide is EXCLUDED by design: a 32-bit/Hamming<=8 exact
# pair listing is ~quadratic in OUTPUT at sf10 (~1e8 pairs) — the gate is
# the parity/spec form; the at-scale contract is q_dedup_simhash_banded.
set -u
export SPARK_DRIVER_MEM=40g SPARK_GRAFT_CPUS=32
OUT=/dev/shm/verify_sf10_r8
SF=/dev/shm/graft_sf10
QUERIES="q_dedup_exact q_dedup_minhash q_dedup_simhash q_dedup_simhash_banded q_dedup_ngram_jaccard q_dedup_containment q_dedup_incremental q_dup_clusters q_canonical_docs q_dedup_embedding q_semdedup q_pagerank q_pagerank_copart q_label_propagation q_lpa_copart q_triangle_count q_triangle_copart q_sssp_copart q_kcore q_table_log q_table_log_partitioned q_table_log_merge q_table_log_dv q_table_log_eq q_table_log_auto q_table_log_sql q_table_log_sql_dv q_table_log_sql_write q_table_log_sql_pow q_table_log_alter q_table_log_sql_delete q_table_log_sql_update q_table_log_sql_merge q_knn_ivf q_knn_pq q_knn_ivfpq"
cd /root/repo
for q in $QUERIES; do
  if [ -d "$OUT/$q" ] && [ -n "$(ls "$OUT/$q" 2>/dev/null)" ]; then
    echo "SKIP $q (already dumped)"
    continue
  fi
  t0=$(date +%s.%N)
  SPARK_GRAFT_ONLY=$q timeout 2400 tools/run.sh graft.Verify "$SF" "$OUT" \
    > "/tmp/sf10_q_$q.log" 2>&1
  rc=$?
  t1=$(date +%s.%N)
  echo "QUERY $q $(echo "$t1 - $t0" | bc) exit=$rc"
done
echo "ALL DONE"
