"""Microbench: analyze()'s counts stage — interpreted JVM HOFs vs one
vectorized Arrow kernel (r14, guide §4.2).

analyze() is q8 and the text_profile contract row. Its counts stage is
interpreted expression work (2 regex splits, 2 aggregate() folds, 4
stopword filter() walks, 1 regex punct count) — none of it codegen'd.
dedup.py's minhash measured ~5x for vectorizing the equivalent shape as
a pandas UDF, so the same hypothesis is tested here, under the same
discipline as scripts/microbench_text_kernels.py:

  1. EQUALITY FIRST: the candidate kernel must match the current
     analyze() bit-for-bit (null-safe, all 8 output columns) on a
     synthetic edge-case battery (nulls, empties, NBSP/U+2028, Turkish
     dotted I, astral-plane chars, combining marks, boundary empty
     tokens) AND the full sf0.01 + sf0.1 corpora, plus an ascii()/ord()
     parity sweep over every encodable codepoint <= U+2FFFF.
  2. Component attribution of the current stage (splits / folds /
     hits / punct in isolation) on a ~500k-row corpus, noop sink.
  3. Interleaved ABBA rounds: full analyze() (JVM) vs analyze_pandas()
     (Arrow kernel + the SAME final projection).

Run: python scripts/microbench_analyze_kernel.py [rounds] [--eq-only]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdk_spark.operators.dedup import _JVM_WS, repartition_for_width
from hdk_spark.operators.text import STOPWORDS, _word_val, analyze, tokenize
from hdk_spark.operators.text import _FP_MOD, _FP_MULT  # noqa: F401
from hdk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("MB_REPLICATE", "100"))

_LANGS = sorted(STOPWORDS)
_STOP_LISTS = [STOPWORDS[lg] for lg in _LANGS]
_PUNCT = ".,;:!?"


def make_counts_udf():
    """Arrow-batched struct-of-counts kernel: exact Python twin of
    analyze()'s counts stage (tokenization via _JVM_WS — the
    property-tested JVM split twin dedup uses)."""
    from pyspark.sql.pandas.functions import pandas_udf

    stop_lists = _STOP_LISTS
    punct_chars = _PUNCT
    ws = _JVM_WS
    mod, mult = _FP_MOD, _FP_MULT

    @pandas_udf(
        "struct<len:int,tlen:int,ntok:int,nltok:int,punct:int,"
        "wtok:bigint,fp:bigint,hits:array<int>>"
    )
    def _counts(texts: pd.Series) -> pd.DataFrame:
        n_langs = len(stop_lists)
        rows = []
        for t in texts:
            if t is None:
                rows.append(
                    (None, None, None, None, None, None, None,
                     [None] * n_langs)
                )
                continue
            st = t.strip(" ")
            toks = ws.split(st)
            lst = t.lower().strip(" ")
            ltoks = ws.split(lst)
            punct = sum(t.count(c) for c in punct_chars)
            wtok = 0
            fp = 0
            for w in toks:
                lw = len(w)
                wtok += (lw + 3) >> 2
                wv = (ord(w[0]) * 10007 + ord(w[-1]) * 101 + lw) if lw else 0
                fp = (fp * mult + wv) % mod
            cnt = Counter(ltoks)
            hits = [sum(cnt[w] for w in sw) for sw in stop_lists]
            rows.append(
                (len(t), len(st), len(toks), len(ltoks), punct, wtok, fp,
                 hits)
            )
        return pd.DataFrame(
            rows,
            columns=["len", "tlen", "ntok", "nltok", "punct", "wtok", "fp",
                     "hits"],
        )

    # same rationale as the minhash sketch (guide §4.4): forbid the
    # optimizer from duplicating the eval below the fan-out exchange
    return _counts.asNondeterministic()


def _finalize(counts: DataFrame, id_col: str) -> DataFrame:
    """analyze()'s final projection, verbatim (plain scalar arithmetic
    over the count columns — shared so both variants compute doubles
    from identical integer inputs with identical expressions)."""
    langs = _LANGS
    n_tokens = F.when(F.col("__tlen") == 0, F.lit(0)).otherwise(F.col("__ntok"))
    p_ratio = F.when(
        F.col("__len") > 0, F.col("__punct").cast("double") / F.col("__len")
    ).otherwise(F.lit(0.0))
    en_hits = F.col("__hits")[langs.index("en")]
    sw_ratio = F.when(
        F.col("__nltok") > 0, en_hits.cast("double") / F.col("__nltok")
    ).otherwise(F.lit(0.0))
    len_score = F.least(F.col("__len").cast("double") / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(p_ratio * F.lit(5.0), F.lit(1.0))
    sw_score = F.least(sw_ratio * F.lit(4.0), F.lit(1.0))
    quality = len_score * F.lit(0.4) + punct_score * F.lit(0.3) + sw_score * F.lit(0.3)

    lang = F.lit("und")
    max_score = F.lit(0)
    for i, lg in enumerate(langs):
        s = F.col("__hits")[i]
        lang = F.when(s > max_score, F.lit(lg)).otherwise(lang)
        max_score = F.when(s > max_score, s).otherwise(max_score)

    return counts.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        (F.col("__wtok") + F.col("__punct").cast("long")).alias("n_tokens_bpe"),
        F.round(p_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
        lang.alias("lang_pred"),
        F.col("__fp").alias("fingerprint"),
    )


def analyze_pandas(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Candidate: one ArrowEvalPython producing the counts struct, then
    analyze()'s own final projection."""
    df = repartition_for_width(df)
    c = make_counts_udf()(F.col(text_col))
    counts = df.select(F.col(id_col), c.alias("__c")).select(
        F.col(id_col),
        F.col("__c.len").alias("__len"),
        F.col("__c.tlen").alias("__tlen"),
        F.col("__c.ntok").alias("__ntok"),
        F.col("__c.nltok").alias("__nltok"),
        F.col("__c.punct").alias("__punct"),
        F.col("__c.wtok").alias("__wtok"),
        F.col("__c.fp").alias("__fp"),
        F.col("__c.hits").alias("__hits"),
    )
    return _finalize(counts, id_col)


EDGE_TEXTS = [
    None,
    "",
    " ",
    "   ",
    "a",
    "the the the der le el que en",
    "a.b,c;d:e!f?g....",
    "  leading and trailing  ",
    "\t\nnon space\x0b\f\rwhitespace mix",
    "nbsp stays one token",
    "İstanbul IĞDIR ıi TURKISH",
    "\U0001d518\U0001d52b\U0001d526 \U0001d554\U0001d560\U0001d555\U0001d556 \U0001f600x x\U0001f600",
    "é café combining",
    "x" * 100 + " " + "y" * 7,
    "1234 5678 90",
    "ß SS ẞ sharp s",
    "word",
    ". , ; : ! ?",
]


def eq_check(spark, a_df: DataFrame, b_df: DataFrame, label: str) -> int:
    cols = a_df.columns
    a = a_df.toPandas().sort_values(cols).reset_index(drop=True)
    b = b_df.toPandas().sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{label}: row count {len(a)} vs {len(b)}"
    bad = 0
    for col in cols:
        av, bv = a[col], b[col]
        neq = ~((av == bv) | (av.isna() & bv.isna()))
        if neq.any():
            bad += int(neq.sum())
            print(f"  {label}/{col}: {int(neq.sum())} mismatches, e.g.")
            print(a[neq].head(3))
            print(b[neq].head(3))
    print(f"  {label}: {'OK' if bad == 0 else f'{bad} MISMATCHES'} "
          f"({len(a)} rows)")
    return bad


def main() -> None:
    eq_only = "--eq-only" in sys.argv
    argn = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = int(argn[0]) if argn else 5
    spark = get_spark("microbench_analyze_kernel")
    sc = spark.sparkContext

    bad = 0

    # --- 0. ascii()/ord parity sweep (every encodable cp <= U+2FFFF) ---
    sc.setJobDescription("ascii/ord parity sweep")
    cps = [c for c in range(1, 0x30000) if not (0xD800 <= c <= 0xDFFF)]
    pdf = pd.DataFrame({"cp": cps, "s": [chr(c) + "x" for c in cps],
                        "e": [ "x" + chr(c) for c in cps]})
    sdf = spark.createDataFrame(pdf)
    mism = sdf.select(
        "cp",
        F.ascii(F.substring("s", 1, 1)).alias("jvm_first"),
        F.ascii(F.substring("e", -1, 1)).alias("jvm_last"),
    ).filter(
        (F.col("jvm_first") != F.col("cp")) | (F.col("jvm_last") != F.col("cp"))
    ).count()
    print(f"  ascii/ord parity: {mism} divergent codepoints "
          f"of {len(cps)}")
    bad += mism

    # --- 1. edge-case battery ---
    sc.setJobDescription("edge-case equality")
    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    bad += eq_check(spark, analyze(edge), analyze_pandas(edge), "edges")

    # --- 2. full corpora ---
    for sf in ("0.01", "0.1"):
        d = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        sc.setJobDescription(f"sf{sf} corpus equality")
        bad += eq_check(spark, analyze(d), analyze_pandas(d), f"sf{sf}")

    if bad:
        print(f"\nEQUALITY FAILED ({bad}) — no timing run.")
        spark.stop()
        sys.exit(1)
    if eq_only:
        spark.stop()
        return

    # --- 3. timing ---
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = (
        docs.select("doc_id", "text")
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)])))
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select("doc_id", "text")
    )

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # component attribution of the CURRENT stage (one pass each)
    t = F.col("text")
    toks = tokenize(t)
    ltoks = tokenize(F.lower(t))

    def hits(words):
        sw = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(ltoks, lambda x: F.array_contains(sw, x)))

    components = {
        "splits_only": corpus.select(
            F.size(toks).alias("a"), F.size(ltoks).alias("b")),
        "folds_only": corpus.select(
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("long")).alias("a"),
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, w: F.pmod(acc * F.lit(_FP_MULT) + _word_val(w),
                                              F.lit(_FP_MOD))).alias("b")),
        "hits_only": corpus.select(
            F.array(*[hits(STOPWORDS[lg]) for lg in _LANGS]).alias("a")),
        "punct_only": corpus.select(
            (F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))).alias("a")),
    }
    print("\ncomponent attribution (one warm + one timed pass each):")
    for name, df in components.items():
        sc.setJobDescription(f"warm {name}")
        run(df)
        sc.setJobDescription(f"time {name}")
        print(f"  {name:12s} {run(df):.3f} s")

    variants = {
        "jvm_hof": lambda: analyze(corpus),
        "arrow_kernel": lambda: analyze_pandas(corpus),
    }
    for name, fn in variants.items():
        sc.setJobDescription(f"warm {name}")
        run(fn())

    results: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(rounds):
        order = list(variants.items()) if r % 2 == 0 else list(variants.items())[::-1]
        for name, fn in order:
            sc.setJobDescription(f"r{r} {name}")
            results[name].append(run(fn()))

    print(f"\ncorpus rows: {corpus.count()}, rounds: {rounds} (ABBA)")
    for name, ts in results.items():
        ts_s = ", ".join(f"{x:.3f}" for x in ts)
        print(f"  {name:12s} best {min(ts):.3f}  median "
              f"{sorted(ts)[len(ts)//2]:.3f}  [{ts_s}]")

    spark.stop()


if __name__ == "__main__":
    main()
