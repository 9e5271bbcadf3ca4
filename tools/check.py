#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql over the same parquet tables.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
(Verify must have been run first to populate <outdir>.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracle = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not pq:
        print(f"FAIL {name}: no spark output")
        fails.append(name)
        continue
    try:
        got = con.sql(f"SELECT * FROM '{pq[0]}'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails.append(name)
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
        fails.append(name)
        continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fails.append(name)
        continue
    # exact value compare, in row order
    diff_cols = []
    for c in g.columns:
        a, b = g[c], w[c]
        try:
            eq = (a.values == b.values) | (a.isna().values & b.isna().values)
        except Exception:
            eq = a.astype(str).values == b.astype(str).values
        if not eq.all():
            i = int((~eq).argmax())
            diff_cols.append((c, i, a.iloc[i], b.iloc[i]))
    if diff_cols:
        c, i, av, bv = diff_cols[0]
        print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} "
              f"({len(diff_cols)} cols differ; dtypes {g[c].dtype}/{w[c].dtype})")
        fails.append(name)
    else:
        # also flag dtype mismatches that exact compare hid
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(w[c].dtype)]
        note = f"  [dtype diff: {dt}]" if dt else ""
        print(f"OK   {name} ({len(g)} rows){note}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} OK" if not only else "")
sys.exit(1 if fails else 0)
