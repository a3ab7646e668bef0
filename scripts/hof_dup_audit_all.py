"""Repo-wide duplicated-HOF-subtree audit over every declared query (r14).

Extends scripts/hof_dup_audit.py (text operators only) to all queries()
rows: CollapseProject inlines a multi-consumer array expression into
every consumer, and interpreted higher-order functions get no codegen
subexpression elimination, so each inlined copy re-splits/re-walks its
input (the defect class fixed in analyze()/gopher/c4 this round). This
script finds any remaining instance anywhere on the contract surface.

Method: build each non-streaming queries() row at sf0.001, take the
OPTIMIZED plan text, extract every balanced-paren subexpression rooted
at an expensive interpreted kernel (split / aggregate / transform /
array_intersect / str_to_map), and count identical copies. Duplicated
copies carry identical attribute ids in the plan text, so exact string
equality is the right match. Rows where one subtree text appears >= 3
times are flagged for a timing A/B (plan-text duplication is the
NECESSARY condition, not sufficient — tiny subtrees duplicate cheaply).

Usage: python scripts/hof_dup_audit_all.py [--sf DIR] [--only prefix]
                                           [--min-dup N] [--min-len L]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--sf", default="/root/testdata/sf0.001")
p.add_argument("--only", default=None)
p.add_argument("--min-dup", type=int, default=3)
p.add_argument("--min-len", type=int, default=40,
               help="ignore subtrees shorter than this many chars")
args = p.parse_args()

from hdk_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

KERNELS = ("split(", "aggregate(", "transform(", "array_intersect(",
           "str_to_map(")


def subtrees(plan: str):
    """Yield each balanced-paren subexpression rooted at a kernel."""
    for kern in KERNELS:
        start = 0
        while True:
            i = plan.find(kern, start)
            if i < 0:
                break
            depth = 0
            j = i + len(kern) - 1  # position of the opening paren
            k = j
            while k < len(plan):
                c = plan[k]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                elif c == "\n":
                    break  # plan lines never wrap a subtree
                k += 1
            yield plan[i:k + 1]
            start = i + len(kern)


def live_lines(plan: str):
    """Plan lines NOT inside an InMemoryRelation build subtree.

    A persisted relation's build plan is REPRINTED at every reference
    in optimizedPlan().toString(), so counting kernels there reports a
    computation that actually runs once (the cache build) N times —
    the dedup_embedding_cosine false positive. Lines are attributed by
    indent: anything deeper than the nearest InMemoryRelation header
    above it belongs to the cached build plan."""
    out = []
    cache_indent: int | None = None
    for ln in plan.splitlines():
        indent = len(ln) - len(ln.lstrip(" :+-"))
        if cache_indent is not None and indent <= cache_indent:
            cache_indent = None
        if "InMemoryRelation" in ln and cache_indent is None:
            cache_indent = indent
            continue
        if cache_indent is None:
            out.append(ln)
    return "\n".join(out)


def main() -> None:
    spark = get_spark("hof_dup_audit_all")
    flagged = 0
    for name, fn in entry.queries().items():
        if args.only and not name.startswith(args.only):
            continue
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, args.sf)
            plan = live_lines(df._jdf.queryExecution().optimizedPlan().toString())
        except Exception as e:  # noqa: BLE001
            print(f"{name:40s} ERROR {type(e).__name__}: {str(e)[:80]}")
            continue
        counts = Counter(s for s in subtrees(plan) if len(s) >= args.min_len)
        dups = {s: n for s, n in counts.items() if n >= args.min_dup}
        if dups:
            flagged += 1
            worst = max(dups.items(), key=lambda kv: kv[1] * len(kv[0]))
            print(f"{name:40s} DUP x{worst[1]} len={len(worst[0])} "
                  f"{worst[0][:90]!r}")
    print(f"-- flagged: {flagged}")
    spark.stop()


if __name__ == "__main__":
    main()
