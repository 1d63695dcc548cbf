#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped query result against its DuckDB oracle on the same sf dir.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for qdir in sorted(glob.glob(os.path.join(out, "*"))):
    name = os.path.basename(qdir)
    if not os.path.isdir(qdir):
        continue
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracles:
        print(f"  {name}: rows-only ({len(spark_df)} rows)"
              + ("  !! EMPTY" if len(spark_df) == 0 else ""))
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"X {name}: oracle SQL error: {e}")
        fails += 1
        continue
    a = spark_df[sorted(spark_df.columns)]
    b = oracle_df[sorted(oracle_df.columns)]
    if list(a.columns) != list(b.columns):
        print(f"X {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
        fails += 1
        continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"X {name}: row count {len(a)} vs {len(b)}")
        fails += 1
        continue
    # driver hashes stringified values; emulate with exact string compare
    astr = a.astype(str).values.tolist()
    bstr = b.astype(str).values.tolist()
    if astr != bstr:
        diffs = [(i, ra, rb) for i, (ra, rb) in enumerate(zip(astr, bstr)) if ra != rb]
        print(f"X {name}: {len(diffs)} differing rows; first: {diffs[0]}")
        fails += 1
        continue
    print(f"  {name}: OK ({len(a)} rows)")
print(f"{'FAIL' if fails else 'PASS'}: {fails} mismatches")
sys.exit(1 if fails else 0)
