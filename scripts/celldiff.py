#!/usr/bin/env python3
"""Cell-diff harness: compare one query's Spark parquet output against its
DuckDB oracle, cell by cell after sorting, and print the first N differing
cells with full-precision values and dtypes.

Usage: python3 scripts/celldiff.py <query_name> [sfdir] [outdir]
(assumes Verify already wrote outdir/<query_name>/*.parquet + oracle_sql.json)
"""
import sys, os, json, glob
import duckdb

NAME = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
files = glob.glob(f"{OUT}/{NAME}/*.parquet")
got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
want = con.execute(oracle[NAME]).fetchdf()

gcols, wcols = sorted(got.columns), sorted(want.columns)
print(f"spark cols: {dict(got.dtypes.astype(str))}")
print(f"oracle cols: {dict(want.dtypes.astype(str))}")
if gcols != wcols:
    sys.exit(f"SCHEMA DIFF: {gcols} vs {wcols}")

g = got[gcols].sort_values(gcols).reset_index(drop=True)
w = want[wcols].sort_values(wcols).reset_index(drop=True)
if len(g) != len(w):
    sys.exit(f"ROWS DIFF: {len(g)} vs {len(w)}")

ndiff = 0
for c in gcols:
    gv, wv = g[c], w[c]
    for i in range(len(g)):
        a, b = gv.iloc[i], wv.iloc[i]
        same = (a == b) or (a != a and b != b)  # NaN == NaN
        if not same:
            ndiff += 1
            if ndiff <= 20:
                print(f"row {i} col {c}: spark={a!r} ({type(a).__name__}) "
                      f"oracle={b!r} ({type(b).__name__}) "
                      f"rowkeys={dict(g.iloc[i])}")
if ndiff == 0:
    # repr-level check: catches dtype drift (int64 vs float64) and signed
    # zero that == comparison hides but a value hash would not
    import hashlib
    def h(df):
        return hashlib.md5("\n".join(
            ",".join(repr(v) for v in row) for row in
            df.itertuples(index=False)).encode()).hexdigest()
    hg, hw = h(g), h(w)
    if hg == hw:
        print(f"IDENTICAL incl. repr-hash ({hg[:12]})")
    else:
        for i in range(len(g)):
            rg = tuple(g.iloc[i]); rw = tuple(w.iloc[i])
            if tuple(map(repr, rg)) != tuple(map(repr, rw)):
                print(f"repr diff row {i}: spark={rg} oracle={rw}")
                break
        print("values == but repr-hash DIFFERS (dtype or -0.0)")
else:
    print(f"{ndiff} differing cells")
