#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracle SQL and compare values (column-name-sorted, row-sorted).
Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)])
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"[FAIL] {name}: columns {list(s.columns)} vs {list(d.columns)}"); fail += 1; continue
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    d = d.sort_values(list(d.columns)).reset_index(drop=True)
    if len(s) != len(d):
        print(f"[FAIL] {name}: rows {len(s)} vs {len(d)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
        print(f"[ OK ] {name}: {len(s)} rows"); ok += 1
    except AssertionError as e:
        print(f"[FAIL] {name}: {str(e).splitlines()[-1][:200]}"); fail += 1
print(f"== {ok} ok, {fail} fail ==")
sys.exit(1 if fail else 0)
