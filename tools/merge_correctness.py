#!/usr/bin/env python3
"""Merge a subset CORRECTNESS artifact into a base one.

Usage: python3 tools/merge_correctness.py <base.json> <subset.json> [note]

Per-query rows from <subset.json> overwrite the base's (a rerun is
always fresher evidence); `_meta` is recomputed honestly: queries_checked
= the merged row count, subset stays the base's unless the base was
itself a subset run, in which case the union of both subsets is
recorded. An optional [note] is appended to _meta.notes (list).
"""
import json, sys

def main():
    base_p, sub_p = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else None
    base = json.load(open(base_p))
    sub = json.load(open(sub_p))
    bmeta = base.pop("_meta", {})
    smeta = sub.pop("_meta", {})
    merged = dict(base)
    merged.update(sub)
    meta = dict(bmeta)
    meta["queries_checked"] = len(merged)
    if bmeta.get("subset") is not None or smeta.get("subset") is not None:
        union = sorted(set(bmeta.get("subset") or list(base)) |
                       set(smeta.get("subset") or list(sub)))
        meta["subset"] = union
        meta["full_run"] = False
    if note:
        meta.setdefault("notes", []).append(note)
    merged["_meta"] = meta
    out = {k: merged[k] for k in sorted(merged) if k != "_meta"}
    out["_meta"] = merged["_meta"]
    with open(base_p, "w") as f:
        json.dump(out, f, indent=2)
    npass = sum(1 for k, v in out.items()
                if k != "_meta" and isinstance(v, dict) and v.get("hash_match"))
    print(f"merged {len(sub)} rows into {base_p}: "
          f"{len(out) - 1} total, {npass} hash-pass")

if __name__ == "__main__":
    main()
