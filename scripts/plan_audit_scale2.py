"""Second-dimension plan-shape audit (r14, seventh session): scale
hazards the first audit (plan_audit.py) does not cover.

Builds each queries() entry at a small SF and inspects the physical
plan (py4j traversal — plan-TEXT regexes mis-parse nested brackets in
window specs; verified with positive/negative controls) for:

- GLOBAL_WINDOW   a WindowExec whose partition spec is EMPTY and whose
                  subtree contains neither a WindowGroupLimitExec nor a
                  TakeOrderedAndProjectExec — the whole child relation
                  flows through ONE task at scale (guide §2). Global
                  rank-≤-k windows are NOT flagged: Spark bounds them
                  with TakeOrderedAndProject (global) or paired
                  partial/final WindowGroupLimit before the single
                  partition, so only tasks×k rows cross.
- MIDPLAN_GLOBAL_SORT  a global SortExec DEEPER than the plan root —
                  a corpus-wide total order paid mid-computation. The
                  root-adjacent (depth ≤ 2) global sort every contract
                  row ends with is the declared answer's ORDER BY and
                  is NOT flagged. (Catalyst's EliminateSorts already
                  removes result-irrelevant mid-plan sorts; this
                  checks none survive.)
- N_SINGLEPART    occurrences of SinglePartition in the formatted text
                  (1-row scalar aggregates and the bounded windows
                  above both produce these — context, not a flag).
- RESCAN:k=path   the same input file appearing k>1 times in the
                  formatted plan. NOTE (measured, see
                  OPTIMIZATION_r14.md): duplicated subtrees TOPPED BY
                  AN EXCHANGE are deduped at runtime by AQE stage
                  reuse — select_temperature_budgets prints 16 scans
                  but costs 1.2-1.8× ONE corpus pass — so this column
                  is where to LOOK, not by itself waste.

Streaming rows are skipped (building them executes the stream).

Usage: python scripts/plan_audit_scale2.py [--sf DIR] [--only prefix]
Writes a TSV to stdout: name, n_singlepart, flags.
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
args = p.parse_args()

from hdk_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark("plan_audit_scale2")

QUERIES = entry.queries()

_BOUNDERS = ("WindowGroupLimitExec", "TakeOrderedAndProjectExec")


def _walk(node, depth: int = 0):
    yield node, depth
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i), depth + 1)


def _walk_feed_chain(node):
    """Walk only the subtree that directly FEEDS ``node`` — stop at
    exchanges and joins (ADVICE r14): a bounder that belongs to an
    unrelated operator deeper in the plan (past a shuffle boundary or
    on the other side of a join) does not bound THIS window's input,
    and accepting it silently unflagged genuinely unbounded windows
    stacked above unrelated top-k subtrees."""
    yield node
    nm = node.getClass().getSimpleName()
    if "Exchange" in nm or "Join" in nm:
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_feed_chain(ch.apply(i))


def unbounded_global_windows(jplan) -> int:
    n = 0
    for node, _ in _walk(jplan):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        if not any(
            d.getClass().getSimpleName() in _BOUNDERS
            for d in _walk_feed_chain(node)
        ):
            n += 1
    return n


def midplan_global_sorts(jplan) -> "list[int]":
    """Depths of global SortExec nodes deeper than the root ORDER BY.
    (`global` is a Python keyword — py4j access via getattr.)"""
    return [
        d
        for node, d in _walk(jplan)
        if node.getClass().getSimpleName() == "SortExec"
        and getattr(node, "global")()
        and d > 2
    ]


rows = []
for name, fn in QUERIES.items():
    if args.only and not name.startswith(args.only):
        continue
    if name.startswith("streaming_"):
        rows.append((name, "-", "SKIP(streaming)"))
        continue
    try:
        df = fn(spark, args.sf)
        qe = df._jdf.queryExecution()
        plan = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        n_gw = unbounded_global_windows(qe.sparkPlan())
        # inside the try (ADVICE r14): a py4j failure here must record
        # an ERROR row, not abort the whole sweep
        deep_sorts = midplan_global_sorts(qe.sparkPlan())
    except Exception as e:  # noqa: BLE001
        rows.append((name, "-", f"ERROR({type(e).__name__}: {str(e)[:80]})"))
        continue
    flags = []
    if n_gw:
        flags.append(f"GLOBAL_WINDOW:{n_gw}")
    if deep_sorts:
        flags.append(f"MIDPLAN_GLOBAL_SORT:depths={deep_sorts}")
    n_single = plan.count("SinglePartition")
    # same file scanned repeatedly (see module docstring caveat)
    locs = re.findall(r"Location: \S+\s+\[?(file:[^\s,\]]+)", plan)
    from collections import Counter

    for path, k in Counter(locs).items():
        if k > 1:
            flags.append(f"RESCAN:{k}x={os.path.basename(path.rstrip('/'))}")
    rows.append((name, str(n_single), ";".join(flags) or "ok"))
    sys.stderr.write(f"done {name}\n")

print("name\tn_singlepart\tflags")
for name, n_single, flags in rows:
    print(f"{name}\t{n_single}\t{flags}")
