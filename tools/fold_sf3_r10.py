#!/usr/bin/env python3
"""Round-10 evidence fold: merge the sf3 oracle rerun into
CORRECTNESS_sf3.json and rewrite the four CORRECTNESS_sf10.json `err`
labels so every claim cites verification that actually exists
(round-9 VERDICT ask 1).
"""
import json, subprocess, sys

sub = json.load(open("/root/sf3_oracle_r10.json"))
rows = {k: v for k, v in sub.items() if k != "_meta"}
bad = [k for k, v in rows.items() if not v.get("hash_match")]
if bad:
    sys.exit(f"sf3 rerun not fully green: {bad} — fix before folding")

subprocess.run(["python3", "tools/merge_correctness.py",
                "CORRECTNESS_sf3.json", "/root/sf3_oracle_r10.json",
                "round-10 rerun: raised oracle timeout to 3000s + 60GB "
                "memory cap; q_dedup_ngram_jaccard re-dumped with the "
                "exact direct-join path (round-10 fix)"], check=True)

p = "CORRECTNESS_sf10.json"
d = json.load(open(p))
d["q_canonical_docs"]["err"] = (
    "sf10 oracle infeasible single-node: DuckDB spill ENOSPC past 79GB "
    "disk with 60GB memory cap (Spark dump recovered round 9, 1383s "
    "wall); hash-verified at sf3 (CORRECTNESS_sf3.json round-10 rerun, "
    "5029 rows) and sf1 (CORRECTNESS_sf1.json)")
d["q_dedup_containment"]["err"] = (
    "sf10 oracle timeout after 2400s (Spark dump recovered round 9, "
    "390s wall); hash-verified at sf3 (CORRECTNESS_sf3.json round-10 "
    "rerun, 2,939,462 rows) and sf1 (CORRECTNESS_sf1.json)")
d["q_dedup_ngram_jaccard"]["err"] = (
    "sf10 oracle infeasible single-node: DuckDB hit 121GB RSS and the "
    "OOM killer (round-9 attempt). The recorded sf10 Spark dump predates "
    "round 10's switch to the exact direct-join path (it came from the "
    "LSH candidate path, which sf3 showed can miss a knife-edge pair); "
    "the EXACT path is hash-verified at sf3 (CORRECTNESS_sf3.json "
    "round-10 rerun, 2,945,980 rows) and sf1 (CORRECTNESS_sf1.json). "
    "sf10 re-dump with the exact path queued for a future escalation.")
d["q_dup_clusters"]["err"] = (
    "sf10 oracle infeasible single-node: spill ENOSPC past 79GB with "
    "60GB memory cap (Spark dump recovered round 9, 895s wall; 5029 "
    "rows); hash-verified at sf3 (CORRECTNESS_sf3.json round-10 rerun, "
    "5029 rows) and sf1 (CORRECTNESS_sf1.json)")
d.setdefault("_meta", {}).setdefault("notes", []).append(
    "round-10: err labels rewritten to cite only existing artifacts; "
    "sf3 rerun verified canonical_docs/containment/ngram_jaccard/"
    "dup_clusters (VERDICT r9 ask 1)")
json.dump(d, open(p, "w"), indent=2)
print("folded + relabeled")
