#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares schema + values (columns sorted by name, rows sorted, exact match;
floats compared exactly after both sides round — mirrors a hash compare).
With [jsonOut], also writes a CORRECTNESS_r{N}.json-shaped artifact
(per-query rows_match/schema_match/hash_match/spark_rows/oracle_rows/err).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    record = {}

    def rec(name, rows_match, schema_match, hash_match,
            spark_rows, oracle_rows, err=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
    con = duckdb.connect()
    # GRAFT_ORACLE_MEM (e.g. "60GB"): cap DuckDB's memory so a heavy
    # oracle SPILLS to .tmp instead of ballooning past RAM — the round-9
    # sf10 ngram oracle hit 121 GB RSS and took the OOM killer (and the
    # whole batch's results) with it. Default of 80% of RAM is fine at
    # driver SFs; scale escalations should set this.
    mem = os.environ.get("GRAFT_ORACLE_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    present = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    names = sorted(oracles.keys() | present)
    # GRAFT_CHECK_ONLY=q_a,q_b restricts the compare to a subset — used for
    # targeted scale-escalation runs where only some queries were dumped.
    only = {n.strip() for n in os.environ.get("GRAFT_CHECK_ONLY", "").split(",")
            if n.strip()}
    if only:
        names = [n for n in names if n in only]
    for name in names:
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: spark query produced no output dir")
            rec(name, False, False, False, 0, 0, "no spark output dir")
            n_fail += 1; continue
        got = load_spark_result(qdir)
        if got is None:
            print(f"FAIL {name}: no spark output")
            rec(name, False, False, False, 0, 0, "no spark output")
            n_fail += 1; continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            rec(name, len(got) > 0, None, None, len(got), None,
                None if len(got) > 0 else "rows-only check empty")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        # GRAFT_ORACLE_TIMEOUT=<sec>: bound each DuckDB oracle query (used
        # by scale-escalation runs where a few oracles are super-linear in
        # SF — e.g. shingle self-joins over a corpus with 100x duplicate
        # mass). A timed-out oracle records err="oracle timeout" and does
        # NOT count as a pass: the artifact stays honest about which
        # queries are hash-verified at this SF vs verified only at lower SF.
        timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
        timer = None
        timed_out = [False]
        if timeout_s > 0:
            import threading
            def _interrupt():
                timed_out[0] = True
                con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            exp = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            # Timeout only when the timer actually fired AND the exception is
            # DuckDB's interrupt — a genuine error that merely coincides with
            # timer expiry must not be relabeled as a timeout.
            is_timeout = timed_out[0] and isinstance(e, duckdb.InterruptException)
            msg = ("oracle timeout after %.0fs" % timeout_s) if is_timeout \
                else f"oracle error: {str(e)[:200]}"
            print(f"FAIL {name}: {msg}")
            rec(name, False, False, False, len(got), 0, msg)
            n_fail += 1
            continue
        finally:
            if timer:
                # cancel() alone races: the timer can fire in the window after
                # fetch_df() returns, calling con.interrupt() with no query
                # running — which would poison the NEXT oracle. join() the
                # thread, then absorb any latent interrupt flag.
                timer.cancel()
                timer.join()
                if timed_out[0]:
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            rec(name, len(g) == len(e), False, False, len(g), len(e),
                "column mismatch")
            n_fail += 1; continue
        if len(g) != len(e):
            # schema_match=None: with differing row sets the dtype proxy
            # below never ran, so schema agreement is UNKNOWN, not True
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            rec(name, False, None, False, len(g), len(e), None)
            n_fail += 1; continue
        # dtype check (schema match proxy)
        dt_mismatch = [(c, str(g[c].dtype), str(e[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        # The driver's hasher stringifies values, so int64 vs float64 on the
        # same column (3 vs 3.0) hash-differs even when pandas says the
        # values match — treat int-vs-float as a HARD FAIL, exactly like the
        # driver would. (q_table_log_sql_merge r08 slipped through this gap:
        # DuckDB sum(BIGINT) -> HUGEINT -> float64 while Spark emits int64.)
        def _num_kind(dt):
            if pd.api.types.is_integer_dtype(dt): return "int"
            if pd.api.types.is_float_dtype(dt): return "float"
            return "other"
        hard_dt = [(c, a, b) for c, a, b in dt_mismatch
                   if {_num_kind(g[c].dtype), _num_kind(e[c].dtype)}
                   == {"int", "float"}]
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:500]}")
            rec(name, True, not dt_mismatch, False, len(g), len(e), None)
            n_fail += 1; continue
        if hard_dt:
            print(f"FAIL {name}: int-vs-float dtype mismatch {hard_dt} "
                  f"(values match, but the driver's hash would differ)")
            rec(name, True, False, False, len(g), len(e),
                f"int-vs-float dtype mismatch: {hard_dt}")
            n_fail += 1; continue
        if dt_mismatch:
            print(f"WARN {name}: dtype mismatch {dt_mismatch} (values match)")
        print(f"PASS {name}: {len(g)} rows")
        rec(name, True, True, True, len(g), len(e))
        n_pass += 1
    if json_out:
        # self-describing artifact: a GRAFT_CHECK_ONLY subset run must not
        # be mistakable for a full-registry run
        record["_meta"] = {
            "sf_dir": sf_dir,
            "queries_checked": len(names),
            "subset": sorted(only) if only else None,
            "full_run": not only,
        }
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
