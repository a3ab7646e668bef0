"""Plan-shape audit over every declared contract query (r14).

Builds each queries() entry at a small SF (default sf0.001 — plan shape
is SF-independent) and greps the physical plan for scale red flags:

- BatchEvalPython        row-at-a-time Python UDF (guide §4.1)
- duplicate Python evals the §4.4 filter-pushdown duplication (same
                         UDF name appearing in >1 eval node)
- CartesianProduct /     accidental quadratic joins (guide §3)
  BroadcastNestedLoopJoin
- exchange count         printed for eyeballing, not flagged

Streaming rows execute their stream when built, so they are skipped by
default (audit them via --streaming).

Usage: python scripts/plan_audit.py [--sf DIR] [--only prefix]
Writes a TSV report to stdout: name, n_exchange, flags.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

p = argparse.ArgumentParser()
p.add_argument("--sf", default="/root/testdata/sf0.001")
p.add_argument("--only", default=None)
p.add_argument("--streaming", action="store_true")
args = p.parse_args()

from hdk_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark("plan_audit")

QUERIES = entry.queries()

rows = []
for name, fn in QUERIES.items():
    if args.only and not name.startswith(args.only):
        continue
    if name.startswith("streaming_") and not args.streaming:
        rows.append((name, "-", "SKIP(streaming)"))
        continue
    try:
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception as e:  # noqa: BLE001
        rows.append((name, "-", f"ERROR({type(e).__name__}: {str(e)[:80]})"))
        continue
    flags = []
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython")
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNLJ")
    # duplicated Python eval: same udf name in >1 eval node
    evals = re.findall(r"(?:Arrow|Batch)EvalPython.*?\[([a-zA-Z_0-9]+)\(", plan)
    dupes = {u for u in evals if evals.count(u) > 1}
    if dupes:
        flags.append("DUP_PYEVAL:" + ",".join(sorted(dupes)))
    n_ex = len(re.findall(r"\bExchange\b", plan)) - plan.count("BroadcastExchange")
    rows.append((name, str(n_ex), ";".join(flags) or "ok"))
    sys.stderr.write(f"done {name}\n")

print("name\tn_exchange\tflags")
for name, n_ex, flags in rows:
    print(f"{name}\t{n_ex}\t{flags}")
