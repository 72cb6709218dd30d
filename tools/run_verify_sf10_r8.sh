#!/bin/bash
# Round-8 targeted sf10 escalation (VERDICT #1): dedup pair family, graph
# co-partition, TableLog write paths, MoR SQL read/write, ANN.
export SPARK_DRIVER_MEM=40g SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY="q_dedup_exact,q_dedup_minhash,q_dedup_simhash,q_dedup_simhash_banded,q_dedup_simhash_wide,q_dedup_ngram_jaccard,q_dedup_containment,q_dedup_incremental,q_dup_clusters,q_canonical_docs,q_dedup_embedding,q_semdedup,q_pagerank,q_pagerank_copart,q_label_propagation,q_lpa_copart,q_triangle_count,q_triangle_copart,q_sssp_copart,q_kcore,q_table_log,q_table_log_partitioned,q_table_log_merge,q_table_log_dv,q_table_log_eq,q_table_log_auto,q_table_log_sql,q_table_log_sql_dv,q_table_log_sql_write,q_table_log_sql_pow,q_knn_ivf,q_knn_pq,q_knn_ivfpq"
rm -rf /dev/shm/verify_sf10_r8
cd /root/repo
tools/run.sh graft.Verify /dev/shm/graft_sf10 /dev/shm/verify_sf10_r8
echo "exit=$?"
