#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt
at a given SF dir, then execute each oracle SQL in DuckDB over the same
parquet tables and compare (schema, row count, sorted-row hash).

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify]
"""
import sys, os, json, subprocess, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        sys.exit("sbt verify failed")

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    outdir = f"{OUT}/{name}"
    files = glob.glob(f"{outdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    want = con.execute(sql).fetchdf()
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        fails.append((name, f"schema: got {gcols} want {wcols}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rows: got {len(got)} want {len(want)}"))
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    same = True
    why = ""
    for c in gcols:
        gv, wv = g[c], w[c]
        # The driver's hash is dtype-sensitive: a DuckDB HUGEINT vs a
        # Spark BIGINT hashes differently even when every value is equal
        # (the q115/q167 failure class).  Mirror that: dtype mismatch is
        # a hard FAIL here, never a silent astype fallback.
        if str(gv.dtype) != str(wv.dtype):
            same = False
            why = (f"dtype mismatch in column {c}: "
                   f"got {gv.dtype} want {wv.dtype} "
                   f"(add an explicit CAST in the oracle SQL)")
            break
        try:
            if not gv.equals(wv):
                import numpy as np
                if gv.dtype.kind in "if":
                    if not np.allclose(gv, wv, rtol=0, atol=0,
                                       equal_nan=True):
                        same = False
                else:
                    if list(gv.astype(str)) != list(wv.astype(str)):
                        same = False
        except Exception:
            same = False
        if not same:
            why = why or f"values differ in column {c}"
            break
    if not same:
        fails.append((name, why))
        continue
    if same:
        print(f"PASS {name} ({len(got)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
