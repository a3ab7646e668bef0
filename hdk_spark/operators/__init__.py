"""Beyond-reference operator library: large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

These extend the reference's OLAP surface (SURVEY.md §2) with the
operations a 100 TB LLM-data pipeline needs; all are DataFrame-native
compositions or Arrow-batched pandas UDFs.
"""

from hdk_spark.operators import (
    avi,
    bpe,
    jpeg,
    png,
    chat,
    clustering,
    crawl,
    dedup,
    graph,
    html,
    layout,
    linkage,
    multimodal,
    packing,
    profile,
    sampling,
    search,
    similarity,
    stats,
    temporal,
    text,
    warc,
    web,
)

__all__ = [
    "avi",
    "bpe",
    "jpeg",
    "png",
    "chat",
    "clustering",
    "crawl",
    "dedup",
    "graph",
    "html",
    "layout",
    "linkage",
    "multimodal",
    "packing",
    "profile",
    "sampling",
    "search",
    "similarity",
    "stats",
    "temporal",
    "text",
    "warc",
    "web",
]
