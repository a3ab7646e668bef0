"""Microbench: barrier-staging for gopher_quality_flags / c4_line_filter
(r14, guide §1.3 — duplicated interpreted work).

scripts/hof_dup_audit.py shows both operators' plans inline their
multi-consumer HOF subtrees into every consumer (gopher: split x30,
transform x12 — the `lines` subtree alone appears ~12 times; c4:
split x7). analyze() measured 2-3x for the same pattern and fixed it by
materializing each array/count ONCE behind a non-deterministic barrier
(CollapseProject cannot cross it). This script measures the same
restaging for the other two operators:

  1. EQUALITY FIRST: staged variant vs current, bit-compared (null-safe,
     all output columns) on an edge battery + full sf0.01/sf0.1 corpora.
  2. Interleaved ABBA rounds on a ~500k-row corpus (sf0.1 docs x 100),
     noop sink, per guide §1.4/§1.5.

Run: python scripts/microbench_hof_staging.py [rounds] [--eq-only]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdk_spark.operators.text import (
    STOPWORDS,
    c4_line_filter,
    gopher_quality_flags,
    tokenize,
)
from hdk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("MB_REPLICATE", "100"))


def gopher_unstaged(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_ellipsis_line_ratio: float = 0.3,
    max_bullet_line_ratio: float = 0.9,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The PRE-r14 gopher_quality_flags body, verbatim (single collapsed
    projection — CollapseProject inlines every multi-consumer subtree),
    kept here as the measurement baseline after text.py adopted the
    staged form."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_words = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"),
    )
    mean_wl = F.when(n_words > 0, total_chars / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ell_sym = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / F.lit(3.0)
    sym_ratio = F.when(
        n_words > 0,
        F.greatest(n_hash.cast("double"), n_ell_sym) / n_words,
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(t, r"\r?\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    n_lines = F.size(lines)
    ell = F.size(F.filter(lines, lambda s: s.endswith("...")))
    bul = F.size(
        F.filter(lines, lambda s: s.rlike(r"^[-*•]"))
    )
    ell_ratio = F.when(n_lines > 0, ell / n_lines).otherwise(F.lit(0.0))
    bul_ratio = F.when(n_lines > 0, bul / n_lines).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    ltoks = tokenize(F.lower(t))
    sw_hits = F.size(F.array_intersect(F.array_distinct(ltoks), sw))
    keep = (
        n_words.between(min_words, max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (ell_ratio <= max_ellipsis_line_ratio)
        & (bul_ratio <= max_bullet_line_ratio)
        & (sw_hits >= min_stopword_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(ell_ratio, 6).alias("ellipsis_ratio"),
        F.round(bul_ratio, 6).alias("bullet_ratio"),
        sw_hits.cast("long").alias("stopword_hits"),
        keep.alias("keep"),
    )


def c4_unstaged(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    blocklist: tuple = ("javascript", "lorem ipsum", "cookie", "cookies",
                        "terms of use", "privacy policy"),
    require_terminal_punct: bool = True,
    drop_brace_docs: bool = True,
) -> DataFrame:
    """The PRE-r14 c4_line_filter body, verbatim."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, r"\r?\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    block_re = "|".join(re.escape(p) for p in blocklist) if blocklist else None

    def line_ok(s):
        ok = F.size(F.split(s, r"\s+")) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & s.rlike(r'[.!?"]$')
        if block_re is not None:
            ok = ok & ~F.lower(s).rlike(block_re)
        return ok

    kept = F.filter(lines, line_ok)
    dropped = (
        t.contains("{") if drop_brace_docs else F.lit(False)
    )
    return df.select(
        F.col(id_col),
        F.when(dropped, F.lit("")).otherwise(
            F.array_join(kept, "\n")
        ).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.when(dropped, F.size(lines)).otherwise(
            F.size(lines) - F.size(kept)
        ).cast("long").alias("n_removed_lines"),
        dropped.alias("dropped"),
    )


EDGE_TEXTS = [
    None,
    "",
    " ",
    "one line.\nsecond line!\nthird?\n- bullet one\n* bullet two",
    "short\nthis line has five whole words.\ncookie policy mention here.",
    "ends with ellipsis...\nanother...\nplain line here okay.",
    "a { brace } doc\nwith lines.\nmore lines here.",
    "the and of to in is it that for " * 10,
    "#### hashes #### and... ellipses... everywhere...",
    "\r\nwindows\r\nline endings.\r\n",
    "   \n  \n\t\n",
    "x" * 400,
    "• unicode bullet line\n- dash bullet\nnormal sentence here.",
    'quoted line ends "\nunquoted line',
]


def eq_check(a_df: DataFrame, b_df: DataFrame, label: str) -> int:
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
            print(f"  {label}/{col}: {int(neq.sum())} mismatches")
            print(a[neq].head(3))
            print(b[neq].head(3))
    print(f"  {label}: {'OK' if bad == 0 else f'{bad} MISMATCHES'} "
          f"({len(a)} rows)")
    return bad


def main() -> None:
    eq_only = "--eq-only" in sys.argv
    argn = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = int(argn[0]) if argn else 5
    spark = get_spark("microbench_hof_staging")
    sc = spark.sparkContext

    # baseline = the pre-r14 unstaged body kept above; candidate = the
    # staged implementation text.py now ships (equality doubles as the
    # old-vs-new regression proof)
    pairs = {
        "gopher": (gopher_unstaged, gopher_quality_flags),
        "c4": (c4_unstaged, c4_line_filter),
    }

    bad = 0
    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    for name, (base, shipped) in pairs.items():
        sc.setJobDescription(f"eq edges {name}")
        bad += eq_check(base(edge), shipped(edge), f"{name}/edges")
        for sf in ("0.01", "0.1"):
            d = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
            sc.setJobDescription(f"eq sf{sf} {name}")
            bad += eq_check(base(d), shipped(d), f"{name}/sf{sf}")

    if bad:
        print(f"\nEQUALITY FAILED ({bad}) — no timing run.")
        spark.stop()
        sys.exit(1)
    if eq_only:
        spark.stop()
        return

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

    variants = {}
    for name, (base, shipped) in pairs.items():
        variants[f"{name}_unstaged"] = lambda c=base: c(corpus)
        variants[f"{name}_shipped"] = lambda s=shipped: s(corpus)

    for name, fn in variants.items():
        sc.setJobDescription(f"warm {name}")
        run(fn())

    results: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(rounds):
        for fam in pairs:
            order = [f"{fam}_unstaged", f"{fam}_shipped"]
            if r % 2 == 1:
                order.reverse()
            for name in order:
                sc.setJobDescription(f"r{r} {name}")
                results[name].append(run(variants[name]()))

    print(f"\ncorpus rows: {corpus.count()}, rounds: {rounds} (ABBA)")
    for name, ts in results.items():
        ts_s = ", ".join(f"{x:.3f}" for x in ts)
        print(f"  {name:16s} best {min(ts):.3f}  median "
              f"{sorted(ts)[len(ts)//2]:.3f}  [{ts_s}]")

    spark.stop()


if __name__ == "__main__":
    main()
