"""Third-dimension plan audit (r14, seventh session): heavy payload
columns crossing HASH-partitioned exchanges (guide §2.3 "project before
the exchange" / §8 "move heavy bytes once").

For every declared query, walks the physical plan (executedPlan's
initial adaptive plan — exchanges are inserted by EnsureRequirements,
so queryExecution().sparkPlan() has NONE; verified) including cached
relations' stored plans, with scans forced to split
(maxPartitionBytes=32k) so the plan shape matches multi-split inputs —
at the local SFs every table is one row-group and a 1-partition child
satisfies every distribution, leaving nothing to audit.

Flags a ShuffleExchangeExec when a string/binary/array/struct column
crosses it WITHOUT being part of the hash key (matched by exprId, not
name — aliases broke the name route). Skipped as inherent:

- rangepartitioning — the contract rows' final ORDER BY carries the
  declared ANSWER columns by definition.
- RoundRobinPartitioning — the deliberate repartition_for_width
  fan-outs.
- SinglePartition — bounded scalar aggregates.

The flags this audit produces still need triage (see
OPTIMIZATION_r14.md): partial→final aggregate BUFFERS (approx sketches,
collect_list accumulators) are bounded intermediates; join/groupBy
outputs that INCLUDE text are the row's semantics when the output is
text-sized anyway. The audit's value is the LOOK list, not a verdict.

Usage: python scripts/plan_audit_payload.py [--sf DIR] [--only prefix]
TSV to stdout: name, n_flagged_exchanges, samples.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

p = argparse.ArgumentParser()
p.add_argument("--sf", default="/root/testdata/sf0.01")
p.add_argument("--only", default=None)
args = p.parse_args()

from hdk_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark("plan_audit_payload")
spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
spark.conf.set("spark.sql.files.openCostInBytes", "0")

_HEAVY = re.compile(r"^(string|binary|array<|map<|struct<)")


def _walk(node):
    yield node
    nm = node.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        yield from _walk(node.initialPlan())
    elif nm == "InMemoryTableScanExec":
        try:
            yield from _walk(node.relation().cachedPlan())
        except Exception:  # noqa: BLE001
            pass
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def heavy_nonkey_exchanges(jplan) -> "list[tuple[str, list[str]]]":
    out = []
    seen = set()
    for n in _walk(jplan):
        if n.getClass().getSimpleName() != "ShuffleExchangeExec":
            continue
        if n.id() in seen:  # cached-plan re-walks reprint instances
            continue
        seen.add(n.id())
        part = n.outputPartitioning()
        ps = part.toString()
        if not ps.startswith("hashpartitioning"):
            continue
        # Only BARE AttributeReference keys exempt a column (ADVICE
        # r14): a key that is an expression over a heavy column (e.g.
        # hashpartitioning(xxhash64(text))) still ships the column's
        # bytes as payload — exempting its references was a false
        # negative.
        key_ids = set()
        exprs = part.expressions()
        for i in range(exprs.size()):
            e = exprs.apply(i)
            if e.getClass().getSimpleName() == "AttributeReference":
                key_ids.add(e.exprId().id())
        attrs = n.output()
        heavy = []
        for i in range(attrs.size()):
            a = attrs.apply(i)
            t = a.dataType().simpleString()
            if _HEAVY.match(t) and a.exprId().id() not in key_ids:
                heavy.append(f"{a.name()}:{t[:24]}")
        if heavy:
            out.append(("hash", heavy))
    return out


rows = []
for name, fn in entry.queries().items():
    if args.only and not name.startswith(args.only):
        continue
    if name.startswith("streaming_"):
        rows.append((name, "-", "SKIP(streaming)"))
        continue
    try:
        df = fn(spark, args.sf)
        hx = heavy_nonkey_exchanges(df._jdf.queryExecution().executedPlan())
    except Exception as e:  # noqa: BLE001
        rows.append((name, "-", f"ERROR({type(e).__name__}: {str(e)[:80]})"))
        continue
    samp = "; ".join(",".join(h[:4]) for _, h in hx[:4])
    rows.append((name, str(len(hx)), samp[:220] or "ok"))
    sys.stderr.write(f"done {name}\n")

print("name\tn_heavy_exchanges\tsamples")
for name, k, samp in rows:
    print(f"{name}\t{k}\t{samp}")
