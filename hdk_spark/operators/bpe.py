"""Byte-pair encoding (Sennrich et al. 2016) trained and applied
Spark-first — the real-tokenizer upgrade over the ``token_count_bpe``
heuristic, and the input to token-budget operators like
``packing.pack_sequences``.

Scale design:

- ``bpe_train`` touches the corpus EXACTLY ONCE: a whitespace-tokenize
  → word-frequency partial aggregation (the Zipf head collapses
  map-side, same shape as ``text.top_terms``). The merge loop then
  runs driver-side over the frequency table — BPE training is
  small-data by construction once word counts exist (HuggingFace's
  trainer does the same), and the ``min_count`` floor bounds the
  collected relation by the same Zipf argument as
  ``text.unigram_logprob``'s <unk> fold. The corpus is never
  re-scanned per merge.
- ``bpe_encode`` is map-only: an Arrow-batched pandas UDF applying
  the merge ranks with the classic greedy lowest-rank loop, memoized
  per word within each batch — Zipf makes the cache hit rate high, so
  the amortized cost per token is near O(1).

Determinism: pair-count ties break on the lexicographically smallest
pair, so the merge list — and therefore every encoding — is a pure
function of (corpus, n_merges, min_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["bpe_train", "bpe_encode", "bpe_train_from_counts"]

# end-of-word sentinel (Sennrich-style): lets the tokenizer distinguish
# word-final subwords; chosen outside the plausible text alphabet
_EOW = "▁"


def bpe_train_from_counts(
    word_counts: "list[tuple[str, int]]", n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop, exposed for testing: given
    (word, frequency) pairs, return the ordered merge list."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if w:
            vocab[tuple(w) + (_EOW,)] = vocab.get(tuple(w) + (_EOW,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train a BPE merge table from a corpus: one word-count pass on
    the cluster, then the bounded driver-side merge loop. ``min_count``
    floors the word-frequency relation before collection (rare words
    contribute negligible pair mass and are where the vocabulary
    explodes at corpus scale)."""
    counts = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    rows = counts.collect()  # bounded by the min_count floor
    return bpe_train_from_counts([(r["w"], r["c"]) for r in rows], n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE: repeatedly merge the lowest-rank adjacent
    pair until none of the remaining pairs has a rank."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge table. Returns
    (id, tokens array<string>, n_tokens). Map-only: one Arrow-batched
    pandas UDF, per-word memoization inside each batch."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                words = t.lower().split() if t else []
                out: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(encode, out_schema)
