#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare: run each
oracle_sql.json entry against the sf tables, compare against the Spark
parquet output (columns sorted by name, rows sorted, values hashed)."""
import json, sys, duckdb, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for tname in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"schema: spark={gc} duck={wc}")); continue
    if len(got) != len(want):
        fails.append((name, f"rows: spark={len(got)} duck={len(want)}")); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    def h(df):
        return hashlib.sha256(
            "\n".join(",".join(repr(v) for v in row) for row in df.itertuples(index=False))
            .encode()).hexdigest()
    if h(g) != h(w):
        diff = (g != w)
        bad = diff.any(axis=1)
        sample = []
        for i in g.index[bad][:3]:
            sample.append(f"row{i}: spark={list(g.loc[i])} duck={list(w.loc[i])}")
        fails.append((name, "value mismatch: " + " | ".join(sample)))
    else:
        print(f"OK    {name} ({len(got)} rows)")
for name, msg in fails:
    print(f"FAIL  {name}: {msg[:400]}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fails else 0)
