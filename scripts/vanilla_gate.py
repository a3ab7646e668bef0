"""Driver-mimic vanilla gate (verify skill): run queries() on a PLAIN
SparkSession from a foreign cwd and compare each row against its DuckDB
oracle at sf0.01, using the repo's own bit-exact comparator.

Usage: cd /tmp && python vanilla_gate.py [--only name1,name2] [--prefix p]
Exit code 0 iff every checked row matches.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

assert os.getcwd() != "/root/repo", "run from a NON-repo cwd"
sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--only", default=None, help="comma-separated query names")
p.add_argument("--prefix", default=None)
p.add_argument("--sf", default="/root/testdata/sf0.01")
args = p.parse_args()

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry
from tests.oracle_compare import assert_frames_match

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla_gate")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

duck = duckdb.connect()
for t in entry.TABLES:
    path = os.path.join(args.sf, f"{t}.parquet")
    if os.path.exists(path):
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

qs, oracles = entry.queries(), entry.oracle_sql()
names = list(qs)
if args.only:
    names = [n for n in args.only.split(",") if n in qs]
if args.prefix:
    names = [n for n in names if n.startswith(args.prefix)]

fails = []
for i, name in enumerate(names):
    t0 = time.time()
    try:
        df = qs[name](spark, args.sf)
        if name in oracles:
            assert_frames_match(df, duck.sql(oracles[name]), name)
            status = "MATCH"
        else:
            n = df.count()
            status = f"ROWS({n})"
    except Exception as e:  # noqa: BLE001
        status = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
        fails.append(name)
    print(f"[{i+1}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)",
          flush=True)

print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
sys.exit(1 if fails else 0)
