#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs graft.Verify at a
given SF, then executes each oracle SQL in DuckDB over the same parquet
tables and compares values column-sorted, row-ordered. Dev tool only — the
engine itself is pure Scala/Spark."""
import json, math, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "0.001"
SKIP_RUN = os.environ.get("SKIP_RUN") == "1"
SFDIR = f"/root/testdata/sf{SF}"
OUT = f"/tmp/verify_sf{SF}"
REPO = "/root/repo"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

if not SKIP_RUN:
    # fresh output dir — a stale per-query parquet from a previous run would
    # otherwise mask a Spark-side failure as a (possibly passing) compare
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    cmd = ["java"] + ADD_OPENS + [
        "-Duser.timezone=UTC", "-Dspark.ui.enabled=false", "-Xmx8g",
        "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.Verify", SFDIR, OUT]
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    sys.stderr.write(r.stderr[-3000:] if r.returncode else "")
    if r.returncode:
        print("VERIFY RUN FAILED", r.returncode)
        sys.exit(1)

import duckdb
import pandas as pd

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(oracle)
fails = []
for name in names:
    try:
        ddf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append(name); print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); continue
    pq = f"{OUT}/{name}"
    if not os.path.isdir(pq):
        fails.append(name); print(f"{name}: MISSING SPARK OUTPUT"); continue
    sdf = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    ddf = ddf[sorted(ddf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(ddf.columns) != list(sdf.columns):
        fails.append(name)
        print(f"{name}: COLUMN MISMATCH duck={list(ddf.columns)} spark={list(sdf.columns)}")
        continue
    if len(ddf) != len(sdf):
        fails.append(name)
        print(f"{name}: ROWCOUNT duck={len(ddf)} spark={len(sdf)}")
        continue
    bad = None
    for c in ddf.columns:
        a, b = ddf[c].tolist(), sdf[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or x != y:
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        fails.append(name)
        c, i, x, y = bad
        print(f"{name}: VALUE DIFF col={c} row={i} duck={x!r} spark={y!r}")
    else:
        print(f"{name}: OK ({len(ddf)} rows)")

print(f"\n{len(names) - len(fails)}/{len(names)} queries match", "FAIL:" if fails else "",
      ",".join(fails))
sys.exit(1 if fails else 0)
