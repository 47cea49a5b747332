#!/usr/bin/env python3
"""Dev mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB runs of oracle_sql.json over the same testdata.

Usage: dev/selfcheck.py [sfdir] [verify_outdir]
"""
import sys, json, glob, os, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def fresh_con():
    # One connection PER ORACLE: the heavy dedup oracles spill tens of GB
    # at sf1 and a shared connection accumulates temp/memory across
    # queries (observed: q_dedup_groups hit disk-full right after
    # q_dedup_canonical's 55 GB run on the same connection).
    c = duckdb.connect()
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for p in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return c


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    got_dir = f"{OUT}/{name}"
    if not os.path.isdir(got_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    t0 = time.time()
    try:
        con = fresh_con()
        exp = con.execute(sql).fetchdf()
        con.close()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    oracle_s = time.time() - t0
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{got_dir}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fails += 1; continue
    # driver semantics: sort columns by name, then compare values in row order
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}"); fails += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); fails += 1; continue
    dt_exp, dt_got = list(map(str, exp.dtypes)), list(map(str, got.dtypes))
    if dt_exp != dt_got:
        print(f"WARN {name}: dtypes exp={dt_exp} got={dt_got}")
    # value compare (stringified, exact)
    import pandas as pd
    bad = None
    for c in exp.columns:
        a, b = exp[c].astype(str).values, got[c].astype(str).values
        neq = a != b
        if neq.any():
            i = neq.argmax()
            bad = (c, i, a[i], b[i]); break
    if bad:
        c, i, va, vb = bad
        print(f"FAIL {name}: value mismatch col={c} row={i} exp={va} got={vb}"); fails += 1
    else:
        print(f"OK   {name} ({len(exp)} rows, oracle {oracle_s:.1f}s)", flush=True)
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
