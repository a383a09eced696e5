#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, runs the matching oracle SQL
from oracle_sql.json in DuckDB (with each test table registered as a view
over its parquet file), sorts columns by name, sorts rows, and compares
values exactly (floats: bit-exact after both sides' round()).
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
failures = 0
proxy_times = {}  # per-oracle DuckDB wall seconds -> PROXY json artifact
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                    ignore_index=True)
    if name not in oracles:
        print(f"[rows-only] {name}: rows={len(got)}" + (" OK" if len(got) > 0 else " EMPTY!"))
        if len(got) == 0:
            failures += 1
        continue
    t0 = time.monotonic()
    exp = con.sql(oracles[name]).df()
    proxy_times[name] = round(time.monotonic() - t0, 4)
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = norm(got), norm(exp)
    status = []
    for c in sorted(set(got.columns) & set(exp.columns)):
        if got[c].dtype != exp[c].dtype:
            print(f"[warn] {name}.{c}: dtype got={got[c].dtype} exp={exp[c].dtype}")
    if sorted(got.columns) != sorted(exp.columns):
        status.append(f"SCHEMA got={sorted(got.columns)} exp={sorted(exp.columns)}")
    elif len(g) != len(e):
        status.append(f"ROWS got={len(g)} exp={len(e)}")
    else:
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
                gv2 = pd.to_numeric(g[c]).values.astype(float)
                ev2 = pd.to_numeric(e[c]).values.astype(float)
                both_nan = np.isnan(gv2) & np.isnan(ev2)
                neq = ~both_nan & (gv2 != ev2)
                if neq.any():
                    i = int(np.argmax(neq))
                    status.append(f"VAL col={c} row={i} got={gv2[i]!r} exp={ev2[i]!r} (n={int(neq.sum())})")
            else:
                neq = pd.Series(gv).astype(str).values != pd.Series(ev).astype(str).values
                if neq.any():
                    i = int(np.argmax(neq))
                    status.append(f"VAL col={c} row={i} got={gv[i]!r} exp={ev[i]!r} (n={int(neq.sum())})")
    if status:
        failures += 1
        print(f"[FAIL] {name}: " + "; ".join(status))
    else:
        print(f"[ok]   {name}: {len(g)} rows, {len(g.columns)} cols")

# With SPARK_GRAFT_ONLY set, Verify dumped a subset on purpose — skip
# the missing-dump scan that exists to catch holes in FULL runs.
if not os.environ.get("SPARK_GRAFT_ONLY"):
    missing = set(oracles) - {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for m in sorted(missing):
        failures += 1
        print(f"[FAIL] {m}: oracle declared but no result parquet")

# Per-query proxy wall times (the 2x-per-query grading is otherwise only
# auditable in aggregate). PROXY_OUT overrides the destination.
proxy_out = os.environ.get("PROXY_OUT", os.path.join(out_dir, "proxy_times.json"))
with open(proxy_out, "w") as f:
    json.dump({"sf": sf_dir, "total_sec": round(sum(proxy_times.values()), 3),
               "queries": proxy_times}, f, indent=0, sort_keys=True)
print(f"[proxy] {len(proxy_times)} oracle timings -> {proxy_out} "
      f"(total {sum(proxy_times.values()):.1f}s)")
sys.exit(1 if failures else 0)
