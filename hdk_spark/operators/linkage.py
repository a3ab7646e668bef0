"""Record-linkage operators: blocked fuzzy matching (the
entity-resolution step of a data-cleaning pipeline — near-identical
names/titles/SKUs that exact joins miss).

The classic shape: an all-pairs edit-distance join is O(n²) and dead
at scale; BLOCKING makes it an equi-join — every candidate pair must
share a cheap deterministic block key (last token, prefix, length
band), then the expensive verify (JVM ``levenshtein``) runs only
inside blocks. Identical to the sketch-dedup design (minhash bands,
simhash blocks): candidate cost ∝ block co-occurrence, never n².

Everything is engine-portable SQL surface (split/lower/levenshtein) —
the DuckDB oracle runs the same formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["block_key", "fuzzy_self_pairs", "fuzzy_join"]


def block_key(col: Column, mode: str = "last_token") -> Column:
    """Deterministic blocking key: ``last_token`` (the discriminative
    tail word of names like 'red bolt'/'old bolt'), ``first_token``,
    ``prefix3`` (first 3 chars), ``length`` (length//4 band), or
    ``soundex`` (phonetic code of the first token — catches
    misspellings that change the prefix; JVM built-in, no SQL-oracle
    twin in DuckDB so contract queries use the other modes)."""
    c = F.lower(F.trim(col))
    if mode == "last_token":
        return F.element_at(F.split(c, r"\s+"), -1)
    if mode == "first_token":
        return F.element_at(F.split(c, r"\s+"), 1)
    if mode == "prefix3":
        return F.substring(c, 1, 3)
    if mode == "length":
        return (F.length(c) / 4).cast("int").cast("string")
    if mode == "soundex":
        return F.soundex(F.element_at(F.split(c, r"\s+"), 1))
    raise ValueError(f"unknown blocking mode {mode!r}")


def fuzzy_self_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_dist: int = 2,
    block: str = "last_token",
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Near-identical value pairs within one relation:
    (id_a, id_b, text_a, text_b, dist) for every pair sharing a block
    whose edit distance ≤ ``max_dist`` (id_a < id_b). One equi-join on
    the block key; ``max_block_size`` guards a degenerate hot block
    (drops it rather than going quadratic — same guard as
    simhash_pairs)."""
    keyed = df.select(
        F.col(key_col).alias("id"),
        F.col(text_col).alias("txt"),
        block_key(F.col(text_col), block).alias("blk"),
    )
    if max_block_size is not None:
        sizes = keyed.groupBy("blk").agg(F.count(F.lit(1)).alias("__bn"))
        keyed = keyed.join(
            sizes.filter(F.col("__bn") <= max_block_size).select("blk"), "blk"
        )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("txt").alias("text_a"), "blk"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("txt").alias("text_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block: str = "last_token",
) -> DataFrame:
    """Blocked fuzzy equi-join between two relations: every (left,
    right) row pair sharing a block with edit distance ≤ ``max_dist``,
    all left/right columns preserved plus ``dist``. The join itself is
    an equi-join on the block key — Catalyst/AQE pick the physical
    strategy and skew handling like any other join."""
    lk = left.withColumn("__blk", block_key(F.col(left_col), block))
    rk = right.withColumn("__blk", block_key(F.col(right_col), block))
    return (
        lk.join(rk, "__blk")
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(right_col)))
        .filter(F.col("dist") <= max_dist)
        .drop("__blk")
    )
