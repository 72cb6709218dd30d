#!/bin/bash
# Round-close CONTROLLED bench capture (round-10 verdict ask 2): r9 and
# r10 both committed noisy-window totals that a later A/B had to correct
# (r10: 250.79 s committed vs 233.02 s controlled). This script is the
# A/B discipline as a tool: on a quiet machine, run graft.Bench N times
# back-to-back (same JVM flags as the driver), report per-run totals,
# the MIN-of-N artifact, and the spread — a total is only trustworthy
# when an immediate rerun reproduces it to ~1-2%.
#
# Usage: tools/bench_controlled.sh [N] [SF_DIR] [OUT_JSON]
# Writes OUT_JSON (min-of-N full bench line, with _meta.runs/spread) and
# prints one summary line for SCALE.md.
set -u
N=${1:-3}
SF=${2:-/root/testdata/sf0.1}
OUT=${3:-/root/repo/BENCH_controlled.json}
cd "$(dirname "$0")/.."
command -v pgrep >/dev/null && pgrep -f "sbt-launch|graft.Verify|duckdb" >/dev/null && \
  echo "WARNING: other JVM/DuckDB work is running — this will not be a quiet-machine capture" >&2
TMP=$(mktemp -d)
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-8g} \
    tools/run.sh graft.Bench 2>/dev/null | grep '"queries"' > "$TMP/run$i.json"
  t=$(python3 -c "import json;print(json.load(open('$TMP/run$i.json'))['value'])")
  echo "run $i: ${t}s"
done
python3 - "$TMP" "$N" "$OUT" <<'EOF'
import json, sys
tmp, n, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
runs = [json.load(open(f"{tmp}/run{i}.json")) for i in range(1, n + 1)]
totals = [r["value"] for r in runs]
best = runs[totals.index(min(totals))]
best["_meta"] = {
    "capture": "controlled min-of-%d (tools/bench_controlled.sh)" % n,
    "run_totals_sec": totals,
    "spread_pct": round(100 * (max(totals) - min(totals)) / min(totals), 2),
}
json.dump(best, open(out, "w"))
print("min=%.2fs max=%.2fs spread=%.1f%% -> %s"
      % (min(totals), max(totals), best["_meta"]["spread_pct"], out))
EOF
rm -rf "$TMP"
