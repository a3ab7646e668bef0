"""Static audit: duplicated interpreted-HOF subtrees in text-operator
projections (r14, guide §1.3).

analyze() stages its tokenization behind non-deterministic barriers
because CollapseProject inlines a multi-consumer array expression into
every consumer, multiplying interpreted per-token work (measured 2-3x
on the sf0.1 profile, r12 notes). This script asks: does any OTHER
operator still carry that pattern? It builds each operator over a tiny
df and counts occurrences of expensive interpreted subexpressions
(split / aggregate / filter / transform / array_intersect) in the
formatted physical plan. Plan-text duplication is the NECESSARY
condition; a timing A/B on the 500k-row corpus decides adoption for
any offender found.

Run: python scripts/hof_dup_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: F401

from hdk_spark.session import get_spark


def main() -> None:
    spark = get_spark("hof_dup_audit")
    df = spark.createDataFrame(
        [(1, "the quick brown fox. jumps over!"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    import hdk_spark.operators.text as T

    ops = {
        "analyze": lambda: T.analyze(df),
        "gopher_quality_flags": lambda: T.gopher_quality_flags(df),
        "c4_line_filter": lambda: T.c4_line_filter(df),
        "code_quality_flags": lambda: T.code_quality_flags(
            df.withColumnRenamed("text", "content").withColumnRenamed(
                "doc_id", "file_id")),
        "ngram_repetition_signals": lambda: T.ngram_repetition_signals(df),
        "repetition_signals": lambda: T.repetition_signals(df),
        "char_entropy": lambda: T.char_entropy(df),
        "fold_homoglyphs": lambda: T.fold_homoglyphs(df),
        "quality_score_sel": lambda: df.select(
            T.quality_score(F.col("text"))),
        "lang_id_sel": lambda: df.select(T.lang_id(F.col("text"))),
        "token_count_bpe_sel": lambda: df.select(
            T.token_count_bpe(F.col("text"))),
        "fingerprint_sel": lambda: df.select(T.fingerprint(F.col("text"))),
    }

    pat = re.compile(r"\b(split|aggregate|transform|array_intersect)\(")
    for name, fn in ops.items():
        try:
            plan = fn()._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} BUILD-ERR {type(e).__name__}: {e}"[:120])
            continue
        counts: dict[str, int] = {}
        for m in pat.finditer(plan):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        # how many distinct split(...) argument heads appear vs total
        splits = re.findall(r"split\(([^,]+),", plan)
        print(f"{name:26s} {counts}  split-args={sorted(set(s.strip() for s in splits))[:4]}")
    spark.stop()


if __name__ == "__main__":
    main()
