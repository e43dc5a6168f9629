#!/usr/bin/env python3
"""Local correctness checker mimicking the driver: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet with DuckDB running oracle_sql.json on the
same testdata tables. Column order-insensitive (sorted by name), row
order-insensitive (sorted), value-exact.
"""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# Cap DuckDB below the box's RAM and give it a spill directory: at the
# factor-10 soak corpus the graph-family replays grow past physical
# memory when one connection has accumulated a hundred prior queries'
# state, and the kernel OOM-kills the whole gate (observed at 130 GB
# RSS). With a cap DuckDB spills or errors per-query instead; a
# per-query error is recorded as that query's FAIL, not a dead gate —
# rerun stragglers in fresh processes via tools/check_one_oracle.py.
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '90GB')}'")
con.sql(f"SET temp_directory='{os.environ.get('GRAFT_DUCK_TMP', '/tmp/graft_ducktmp')}'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        fails.append((name, "spark output missing")); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sdf = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"schema: spark={scols} oracle={ocols}")); continue
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    if len(s) != len(o):
        fails.append((name, f"rows: spark={len(s)} oracle={len(o)}")); continue
    # dtype-strict: the driver hashes raw values, so int64 vs float64
    # (DuckDB HUGEINT sums) or tz-aware vs naive timestamps MUST fail here too
    dt_bad = [(c, str(s[c].dtype), str(o[c].dtype)) for c in scols
              if str(s[c].dtype) != str(o[c].dtype)]
    if dt_bad:
        fails.append((name, f"dtype: {dt_bad}")); continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
        print(f"PASS {name} ({len(s)} rows)")
    except AssertionError as e:
        fails.append((name, str(e).split(chr(10))[0:4]))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
