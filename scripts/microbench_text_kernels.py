"""Microbenchmark: per-row text-kernel variants (r14 session 2).

The sf0.1 bench corpus is 5,000 docs, so q8's headline figure is
dominated by fixed job/stage overhead — per-row kernel changes are
invisible there. This script measures the kernels themselves on an
in-session ~500k-row corpus (sf0.1 documents unioned with itself 100×
via explode — computed fresh every run, nothing persisted across runs)
with interleaved A/B rounds and the noop sink, per guide §1.4/§1.5.

Variants measured (all value-identical by construction):

  punct   — count of .,;:!? chars:
            A: length(t) - length(regexp_replace(t, '[\\.,;:!\\?]', ''))
            B: length(t) - length(translate(t, '.,;:!?', ''))
  alnum   — count of [A-Za-z0-9] chars: regexp_replace vs translate
  ltoks   — lowered token array:
            A: split(trim(lower(t)), '\\s+')
            B: transform(split(trim(t), '\\s+'), lower)
  folds   — the two aggregate() folds of analyze() (BPE token cost +
            rolling fingerprint) run as two walks vs one fused walk
            with a struct accumulator.

Run: python scripts/microbench_text_kernels.py [rounds]
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hdk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("MB_REPLICATE", "100"))

_ALNUM = string.ascii_uppercase + string.ascii_lowercase + string.digits
_ALPHA = string.ascii_uppercase + string.ascii_lowercase

_FP_MOD = 2_147_483_647
_FP_MULT = 1_000_003


def _word_val(w):
    return (
        F.ascii(F.substring(w, 1, 1)) * F.lit(10_007)
        + F.ascii(F.substring(w, -1, 1)) * F.lit(101)
        + F.length(w)
    ).cast("long")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("microbench_text_kernels")
    sc = spark.sparkContext

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = (
        docs.select("doc_id", "text")
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)])))
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select("doc_id", "text")
    )

    t = F.col("text")
    toks = F.split(F.trim(t), r"\s+")

    variants: dict[str, dict[str, object]] = {
        "punct": {
            "regexp": F.length(t)
            - F.length(F.regexp_replace(t, r"[\.,;:!\?]", "")),
            "translate": F.length(t) - F.length(F.translate(t, ".,;:!?", "")),
        },
        "alnum": {
            "regexp": F.length(t)
            - F.length(F.regexp_replace(t, r"[A-Za-z0-9]", "")),
            "translate": F.length(t) - F.length(F.translate(t, _ALNUM, "")),
        },
        "ltoks": {
            "resplit": F.size(
                F.filter(
                    F.split(F.trim(F.lower(t)), r"\s+"),
                    lambda x: F.array_contains(
                        F.array(*[F.lit(w) for w in
                                  ["the", "a", "and", "of", "to",
                                   "in", "is", "it", "that", "for"]]),
                        x,
                    ),
                )
            ),
            "transform": F.size(
                F.filter(
                    F.transform(toks, F.lower),
                    lambda x: F.array_contains(
                        F.array(*[F.lit(w) for w in
                                  ["the", "a", "and", "of", "to",
                                   "in", "is", "it", "that", "for"]]),
                        x,
                    ),
                )
            ),
        },
        "folds": {
            "two_walks": F.aggregate(
                toks, F.lit(0).cast("long"),
                lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("long"),
            )
            + F.aggregate(
                toks, F.lit(0).cast("long"),
                lambda acc, w: F.pmod(
                    acc * F.lit(_FP_MULT) + _word_val(w), F.lit(_FP_MOD)
                ),
            ),
            "fused": F.aggregate(
                toks,
                F.struct(
                    F.lit(0).cast("long").alias("w"),
                    F.lit(0).cast("long").alias("fp"),
                ),
                lambda acc, w: F.struct(
                    (acc["w"] + F.ceil(F.length(w) / 4).cast("long")).alias("w"),
                    F.pmod(
                        acc["fp"] * F.lit(_FP_MULT) + _word_val(w), F.lit(_FP_MOD)
                    ).alias("fp"),
                ),
                lambda acc: acc["w"] + acc["fp"],
            ),
        },
    }

    def run(col) -> float:
        t0 = time.perf_counter()
        corpus.select(col.alias("v")).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # warm codegen + scan caches once per variant expression
    for fam, vs in variants.items():
        for name, col in vs.items():
            sc.setJobDescription(f"warm {fam}/{name}")
            run(col)

    results: dict[str, dict[str, list[float]]] = {
        fam: {name: [] for name in vs} for fam, vs in variants.items()
    }
    for r in range(rounds):
        for fam, vs in variants.items():
            order = list(vs.items()) if r % 2 == 0 else list(vs.items())[::-1]
            for name, col in order:  # ABBA across rounds
                sc.setJobDescription(f"r{r} {fam}/{name}")
                results[fam][name].append(run(col))

    print(f"\ncorpus rows: {corpus.count()}, rounds: {rounds} (ABBA)")
    for fam, vs in results.items():
        print(f"\n{fam}:")
        for name, ts in vs.items():
            ts_s = ", ".join(f"{x:.3f}" for x in ts)
            print(f"  {name:10s} best {min(ts):.3f}  median "
                  f"{sorted(ts)[len(ts)//2]:.3f}  [{ts_s}]")

    # value-equality spot check on the REAL corpus (all rows, both SFs)
    print("\nequality checks (real corpora):")
    for sf in ("0.01", "0.1"):
        d = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        tt = F.col("text")
        tk = F.split(F.trim(tt), r"\s+")
        pairs = {
            "punct": (
                F.length(tt) - F.length(F.regexp_replace(tt, r"[\.,;:!\?]", "")),
                F.length(tt) - F.length(F.translate(tt, ".,;:!?", "")),
            ),
            "alnum": (
                F.length(tt) - F.length(F.regexp_replace(tt, r"[A-Za-z0-9]", "")),
                F.length(tt) - F.length(F.translate(tt, _ALNUM, "")),
            ),
            "alpha": (
                F.length(tt) - F.length(F.regexp_replace(tt, r"[A-Za-z]", "")),
                F.length(tt) - F.length(F.translate(tt, _ALPHA, "")),
            ),
            "hash": (
                F.length(tt) - F.length(F.regexp_replace(tt, r"#", "")),
                F.length(tt) - F.length(F.translate(tt, "#", "")),
            ),
            "ltoks": (
                F.split(F.trim(F.lower(tt)), r"\s+"),
                F.transform(F.split(F.trim(tt), r"\s+"), F.lower),
            ),
            "folds": (
                F.aggregate(
                    tk, F.lit(0).cast("long"),
                    lambda acc, w: F.pmod(
                        acc * F.lit(_FP_MULT) + _word_val(w), F.lit(_FP_MOD)
                    ),
                ),
                F.aggregate(
                    tk,
                    F.struct(
                        F.lit(0).cast("long").alias("w"),
                        F.lit(0).cast("long").alias("fp"),
                    ),
                    lambda acc, w: F.struct(
                        (acc["w"] + F.ceil(F.length(w) / 4).cast("long")).alias("w"),
                        F.pmod(
                            acc["fp"] * F.lit(_FP_MULT) + _word_val(w),
                            F.lit(_FP_MOD),
                        ).alias("fp"),
                    ),
                    lambda acc: acc["fp"],
                ),
            ),
        }
        for name, (a, b) in pairs.items():
            bad = d.select(
                a.alias("a"), b.alias("b")
            ).filter(
                ~(F.col("a").eqNullSafe(F.col("b")))
            ).count()
            print(f"  sf{sf} {name:6s}: mismatches={bad}")

    spark.stop()


if __name__ == "__main__":
    main()
