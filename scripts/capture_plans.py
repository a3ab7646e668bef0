"""Capture .explain('formatted') for the nine headline bench queries.

Usage: python scripts/capture_plans.py <outdir> [suffix]
Writes <outdir>/<query>_<suffix>.txt (suffix defaults to 'before').
Plan capture is pure planning — no jobs run — so it is safe to run
while other work shares the box.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
os.makedirs(outdir, exist_ok=True)

from hdk_spark.session import get_spark
from __spark_entry__ import load_tables
from bench import BENCH_SQL, SF_DIR

spark = get_spark("hdk_spark_plan_capture")
load_tables(spark, SF_DIR)

from hdk_spark.operators.dedup import minhash_lsh_dedup
from hdk_spark.operators.similarity import ann_lsh_topk
from hdk_spark.operators.text import analyze

docs = spark.table("documents")
emb = spark.table("embeddings")

makers = {
    "q7_minhash_dedup": lambda: minhash_lsh_dedup(docs, threshold=0.5),
    "q8_text_profile": lambda: analyze(docs),
    "q9_ann_topk": lambda: ann_lsh_topk(emb, [0, 1, 2, 3, 4], k=10, dim=64),
}
for name, sql in BENCH_SQL.items():
    makers[name] = lambda s=sql: spark.sql(s)

for name, mk in makers.items():
    df = mk()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")
