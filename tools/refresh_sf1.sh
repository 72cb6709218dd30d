#!/bin/bash
# Round-close sf1 refresh (the round-8 VERDICT ask: sf1 evidence must
# never lag the registry). Runs ONLY the gates missing from
# CORRECTNESS_sf1.json (or an explicit QUERIES list) at sf1, oracle-checks
# them, and merges the rows into the committed artifact.
#
# Usage:
#   tools/refresh_sf1.sh                  # auto-detect new gates
#   QUERIES="q_a q_b" tools/refresh_sf1.sh
#
# Prereq: /dev/shm/graft_sf1 (tools/gen_scale.py /root/testdata/sf0.1
# /dev/shm/graft_sf1 10). Dumps go to real disk (tmpfs pitfall).
set -eu
cd "$(dirname "$0")/.."
SF=${SF:-/dev/shm/graft_sf1}
OUT=${OUT:-/root/sf1_refresh}
ART=CORRECTNESS_sf1.json

if [ -z "${QUERIES:-}" ]; then
  QUERIES=$(python3 - <<'EOF'
import json, subprocess
have = set(json.load(open("CORRECTNESS_sf1.json"))) - {"_meta"}
# registry = the dumped oracle map of the LAST full verify run if
# present, else ask a quick JVM for the query names
import os, glob
names = None
for d in ["/tmp/verify_out"]:
    p = os.path.join(d, "oracle_sql.json")
    if os.path.exists(p):
        names = set(json.load(open(p)))
        names |= {os.path.basename(x) for x in glob.glob(d + "/q_*") if os.path.isdir(x)}
        break
if names is None:
    raise SystemExit("run a full sf0.01 Verify first (/tmp/verify_out)")
print(" ".join(sorted(names - have)))
EOF
)
fi
if [ -z "$QUERIES" ]; then echo "sf1 artifact already covers the registry"; exit 0; fi
echo "refreshing sf1 for: $QUERIES"
rm -rf "$OUT"; mkdir -p "$OUT"
CSV=$(echo "$QUERIES" | tr ' ' ',')
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$CSV" tools/run.sh graft.Verify "$SF" "$OUT"
GRAFT_CHECK_ONLY="$CSV" GRAFT_ORACLE_TIMEOUT=${GRAFT_ORACLE_TIMEOUT:-600} \
  python3 tools/check_correctness.py "$SF" "$OUT" /tmp/sf1_refresh.json || true
python3 tools/merge_correctness.py "$ART" /tmp/sf1_refresh.json \
  "round-close refresh: $CSV"
