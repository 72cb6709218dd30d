#!/bin/bash
# Round-9: intermediate-SF (sf3 = 30x sf0.1) hash verification for the
# dedup gates whose DuckDB oracles are SUPER-LINEAR in SF and do not fit
# sf10 single-node (per-char simhash recompute / brute-force cosine over
# the full corpus in SQL). sf3 keeps the oracle inside a generous
# timeout while still proving the engine 30x past the driver's gate.
# Prereq: python3 tools/gen_scale.py /root/testdata/sf0.1 /dev/shm/graft_sf3 30
set -u
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32
OUT=${OUT:-/root/sf3_dumps_r9}
SF=/dev/shm/graft_sf3
QUERIES=${QUERIES:-"q_dedup_embedding q_dedup_simhash q_dedup_simhash_banded"}
mkdir -p "$OUT"
cd /root/repo
for q in $QUERIES; do
  if [ -d "$OUT/$q" ] && [ -n "$(ls "$OUT/$q" 2>/dev/null)" ]; then
    echo "SKIP $q (already dumped)"
    continue
  fi
  t0=$(date +%s.%N)
  SPARK_GRAFT_ONLY=$q timeout 2400 tools/run.sh graft.Verify "$SF" "$OUT" \
    > "/tmp/sf3_r9_$q.log" 2>&1
  rc=$?
  t1=$(date +%s.%N)
  echo "QUERY $q $(echo "$t1 - $t0" | bc) exit=$rc"
done
echo "ALL DONE"
