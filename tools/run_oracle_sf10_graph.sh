#!/bin/bash
# Round-9: re-run the sf10 DuckDB oracles that died on spill space or
# short timeouts in round 8 (the graph family + simhash). Spark dumps
# already exist (/dev/shm/verify_sf10_r8); only the oracle side reruns.
#
# DuckDB spills to .tmp under CWD — run from REAL DISK (never tmpfs:
# the round-8 pitfall), one query per process so a crash can't poison
# the shared connection, generous timeout, and a disk-space floor check
# between queries. Results merge into CORRECTNESS_sf10.json afterwards
# via tools/merge_correctness.py.
set -u
DUMPS=${DUMPS:-/dev/shm/verify_sf10_r8}
SF=${SF:-/dev/shm/graft_sf10}
SPILL=${SPILL:-/root/duck_spill}
OUTDIR=${OUTDIR:-/root/sf10_oracle_r9}
QUERIES=${QUERIES:-"q_kcore q_lpa_copart q_pagerank q_pagerank_copart q_sssp_copart q_triangle_copart q_triangle_count q_dedup_simhash"}
mkdir -p "$SPILL" "$OUTDIR"
for q in $QUERIES; do
  avail=$(df --output=avail / | tail -1)
  if [ "$avail" -lt 20000000 ]; then
    echo "SKIP $q: <20G free on /, refusing to start a spilling oracle"
    continue
  fi
  echo "ORACLE $q ..."
  ( cd "$SPILL" && GRAFT_CHECK_ONLY=$q GRAFT_ORACLE_TIMEOUT=${GRAFT_ORACLE_TIMEOUT:-2400} \
      GRAFT_ORACLE_MEM=${GRAFT_ORACLE_MEM:-60GB} \
      timeout 3000 python3 -u /root/repo/tools/check_correctness.py \
      "$SF" "$DUMPS" "$OUTDIR/$q.json" ) > "/tmp/oracle_sf10_$q.log" 2>&1
  echo "ORACLE $q exit=$? $(tail -2 /tmp/oracle_sf10_$q.log | head -1)"
  rm -rf "$SPILL/.tmp"
done
echo "ALL DONE"
