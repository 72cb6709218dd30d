#!/bin/bash
# Round-9 sf10 recovery: the four queries whose round-8 Spark runs
# completed but whose dumps were lost to the tmpfs-pressure incident,
# plus the round-9 table-format gates. Dumps go to REAL DISK (the
# round-8 pitfall: /dev/shm output + a spilling DuckDB = OOM-killed
# checker and lost dumps). One JVM per query so a failure can't kill
# the batch.
set -u
export SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32
# zstd shuffle compression: the shingle shuffles behind canonical_docs /
# ngram_jaccard spill ~100 GB lz4 at sf10 - zstd roughly halves that,
# which is the difference between fitting the disk+tmpfs split and the
# OOM killer (heap stays at 32g for the same reason: every tmpfs spill
# byte is RAM)
export SPARK_EXTRA_JAVA_OPTS="-Dspark.io.compression.codec=zstd"
# shuffle spill split across disk + tmpfs: q_canonical_docs spills >80 GB
# at sf10 — more than / alone offers, and ALL of it on tmpfs is the
# round-8 OOM incident. Round-robin over both keeps each half-sized.
mkdir -p /dev/shm/spill_r9
export SPARK_LOCAL_DIRS=/tmp,/dev/shm/spill_r9
OUT=${OUT:-/root/sf10_dumps_r9}
SF=/dev/shm/graft_sf10
QUERIES=${QUERIES:-"q_canonical_docs q_dedup_containment q_dedup_ngram_jaccard q_dup_clusters q_table_log_widen q_table_log_cdc_dml"}
mkdir -p "$OUT"
cd /root/repo
for q in $QUERIES; do
  if [ -d "$OUT/$q" ] && [ -n "$(ls "$OUT/$q" 2>/dev/null)" ]; then
    echo "SKIP $q (already dumped)"
    continue
  fi
  t0=$(date +%s.%N)
  SPARK_GRAFT_ONLY=$q timeout 2400 tools/run.sh graft.Verify "$SF" "$OUT" \
    > "/tmp/sf10_r9_$q.log" 2>&1
  rc=$?
  t1=$(date +%s.%N)
  echo "QUERY $q $(awk "BEGIN{printf \"%.0f\", $t1 - $t0}")s exit=$rc"
done
echo "ALL DONE"
