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

__all__ = ["bpe_train", "bpe_encode", "bpe_train_from_counts",
           "unigram_train", "unigram_encode", "unigram_train_from_counts",
           "wordpiece_train", "wordpiece_encode",
           "wordpiece_train_from_counts"]

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


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" §3 /
# SentencePiece's unigram model) — the other real-world tokenizer
# family next to BPE. Same scale contract: ONE distributed word-count
# pass, then training runs driver-side over the bounded frequency
# table; encoding is a map-only Arrow-batched Viterbi with per-batch
# word memoization.
# ---------------------------------------------------------------------------


def _viterbi_segment(
    word: str,
    logp: "dict[str, float]",
    max_piece_len: int,
    floor: float,
) -> "list[str]":
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ log p, ties to FEWER pieces, then to the lexicographically
    LARGEST piece sequence — a total order, so the segmentation is a
    pure function of (word, vocab). Out-of-vocab single characters
    score ``floor`` (coverage guarantee: a path always exists)."""
    n = len(word)
    best: "list[tuple | None]" = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for ln in range(1, min(max_piece_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            piece = word[i - ln:i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            key = (prev[0] + lp, prev[1] - 1, prev[2] + (piece,))
            if cand is None or key > cand:
                cand = key
        best[i] = cand
    return list(best[n][2])


def unigram_train_from_counts(
    word_counts: "list[tuple[str, int]]",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    iters: int = 2,
    seed_factor: int = 8,
) -> "list[tuple[str, float]]":
    """The driver-side trainer, exposed for testing: hard-EM (Viterbi)
    unigram-LM fitting over a (word, frequency) table.

    1. SEED: every substring of length ≤ ``max_piece_len`` of every
       word, weighted by word frequency; all single characters are
       mandatory (coverage), multi-char pieces capped at
       ``vocab_size·seed_factor`` by (count desc, piece asc).
    2. EM ×``iters``: E-step Viterbi-segments each distinct word under
       current probs and accumulates frequency-weighted piece counts
       (hard EM — deterministic where soft-EM float accumulation
       order would not be); M-step re-normalizes. Single chars floor
       at count 1 so coverage never dies.
    3. PRUNE to ``vocab_size``: all single chars + top multi-char
       pieces by (count desc, piece asc).

    Returns [(piece, log p)] sorted by (-count, piece) — a pure
    function of its inputs (ties broken totally everywhere)."""
    import math

    wc = [(w, int(c)) for w, c in word_counts if w]
    chars = sorted({ch for w, _ in wc for ch in w})
    sub_counts: "dict[str, int]" = {}
    for w, c in wc:
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                s = w[i:i + ln]
                sub_counts[s] = sub_counts.get(s, 0) + c
    multi = sorted(
        ((s, c) for s, c in sub_counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: vocab_size * seed_factor]
    counts = {ch: sub_counts.get(ch, 1) for ch in chars}
    counts.update(dict(multi))

    def _probs(cts: "dict[str, int]") -> "dict[str, float]":
        tot = sum(cts.values())
        return {s: math.log(c / tot) for s, c in cts.items() if c > 0}

    logp = _probs(counts)
    floor = min(logp.values()) - 10.0 if logp else -30.0
    for _ in range(iters):
        new_counts: "dict[str, int]" = {}
        for w, c in wc:
            for piece in _viterbi_segment(w, logp, max_piece_len, floor):
                new_counts[piece] = new_counts.get(piece, 0) + c
        for ch in chars:  # coverage floor
            new_counts[ch] = max(new_counts.get(ch, 0), 1)
        counts = new_counts
        logp = _probs(counts)
        floor = min(logp.values()) - 10.0
    singles = [(s, c) for s, c in counts.items() if len(s) == 1]
    multis = sorted(
        ((s, c) for s, c in counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(vocab_size - len(singles), 0)]
    kept = dict(singles + multis)
    tot = sum(kept.values())
    return sorted(
        ((s, math.log(c / tot)) for s, c in kept.items()),
        key=lambda kv: (-kept[kv[0]], kv[0]),
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    iters: int = 2,
    min_count: int = 2,
) -> "list[tuple[str, float]]":
    """Train the unigram-LM vocabulary from a corpus: the bpe_train
    shape — one distributed word-count pass (min_count-floored, Zipf-
    bounded), then the bounded driver-side EM."""
    counts = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    rows = counts.collect()  # bounded by the min_count floor
    return unigram_train_from_counts(
        [(r["w"], r["c"]) for r in rows], vocab_size, max_piece_len, iters
    )


def unigram_encode(
    df: DataFrame,
    vocab: "list[tuple[str, float]]",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: "int | None" = None,
) -> DataFrame:
    """Viterbi-tokenize ``text_col`` under a unigram vocab (trained or
    hand-specified [(piece, logp)]). Returns (id, tokens, n_tokens) —
    the bpe_encode surface, so the two tokenizer families are drop-in
    interchangeable upstream of packing/budget operators. Map-only
    Arrow batches, per-batch word memoization; OOV single chars take
    the floor path (min vocab logp − 10), so encoding is total."""
    from collections.abc import Iterator

    import pandas as pd

    logp = {s: float(lp) for s, lp in vocab}
    if not logp:
        raise ValueError("vocab must be non-empty")
    mpl = max_piece_len or max(len(s) for s in logp)
    floor = min(logp.values()) - 10.0
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: "dict[str, list[str]]" = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                words = t.lower().split() if t else []
                out: "list[str]" = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _viterbi_segment(w, logp, mpl, floor)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        encode, out_schema
    )


# ---------------------------------------------------------------------------
# WordPiece (Schuster & Nakajima 2012; the BERT tokenizer family) —
# the third real-world tokenizer next to BPE and unigram-LM. Same
# scale contract as bpe_train/bpe_encode: ONE distributed word-count
# pass, bounded driver-side merge loop, map-only Arrow-batched encode.
#
# Two deliberate contract points (both match the HuggingFace
# WordPiece trainer/encoder, the de-facto public spec):
# - training selects the pair maximizing count(ab) / (count(a)·count(b))
#   — the likelihood gain of the merge under a unigram factorization —
#   compared EXACTLY by cross-multiplied integers (no float ties);
# - encoding ignores merge order entirely and greedily takes the
#   LONGEST vocab piece at each position ('##' continuation prefix);
#   a word with any un-coverable position encodes to [UNK] as a whole.
# ---------------------------------------------------------------------------

_WP_CONT = "##"


def wordpiece_train_from_counts(
    word_counts: "list[tuple[str, int]]",
    n_merges: int = 200,
) -> list[str]:
    """Driver-side WordPiece trainer, exposed for testing: given
    (word, frequency) pairs, return the vocabulary (alphabet pieces
    plus one merged piece per iteration, insertion-ordered).

    Pair selection maximizes count(ab)/(count(a)·count(b)); the
    comparison cross-multiplies integer counts so ties are exact, and
    ties break on the lexicographically smallest pair — the vocab is a
    pure function of (corpus, n_merges)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if not w:
            continue
        sym = (w[0],) + tuple(_WP_CONT + ch for ch in w[1:])
        vocab[sym] = vocab.get(sym, 0) + c
    pieces: dict[str, None] = {}
    for sym in sorted(vocab):
        for s in sym:
            pieces.setdefault(s, None)
    for _ in range(n_merges):
        single: dict[str, int] = {}
        pair: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for s in sym:
                single[s] = single.get(s, 0) + c
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair[p] = pair.get(p, 0) + c
        if not pair:
            break
        # max count(ab)/(count(a)*count(b)) via cross-multiplication:
        # ab1/(a1*b1) > ab2/(a2*b2)  <=>  ab1*a2*b2 > ab2*a1*b1
        best = None
        best_num = best_den = 0
        for p, cab in pair.items():
            den = single[p[0]] * single[p[1]]
            if (
                best is None
                or cab * best_den > best_num * den
                or (cab * best_den == best_num * den and p < best)
            ):
                best, best_num, best_den = p, cab, den
        a, b = best
        joined = a + (b[len(_WP_CONT):] if b.startswith(_WP_CONT) else b)
        pieces.setdefault(joined, None)
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return list(pieces)


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_count: int = 2,
) -> list[str]:
    """Train a WordPiece vocabulary: ONE word-count pass on the
    cluster (partial aggregation collapses the Zipf head map-side,
    ``min_count`` floors the collected relation), then the bounded
    driver-side likelihood-scored merge loop."""
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
    return wordpiece_train_from_counts(
        [(r["w"], r["c"]) for r in rows], n_merges
    )


def _wordpiece_word(
    word: str,
    vocab: "set[str]",
    unk: str,
    max_word_len: int,
) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word; any
    un-coverable position collapses the WHOLE word to [UNK] (the BERT
    contract — partial coverage is not emitted)."""
    if not word:
        return []
    if len(word) > max_word_len:
        return [unk]
    out: list[str] = []
    start, n = 0, len(word)
    while start < n:
        end = n
        piece = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = _WP_CONT + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        start = end
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    unk: str = "[UNK]",
    max_word_len: int = 100,
) -> DataFrame:
    """Tokenize ``text_col`` with a WordPiece vocabulary (greedy
    longest-match, '##' continuation prefix). Returns
    (id, tokens array<string>, n_tokens) — the bpe_encode-compatible
    surface. Map-only: one Arrow-batched pandas UDF with per-batch
    word memoization; the vocab ships as a broadcast-sized closure
    set (real vocabularies are 30-50k pieces)."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    from collections.abc import Iterator

    import pandas as pd

    vset = set(vocab)
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
                        enc = _wordpiece_word(w, vset, unk, max_word_len)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        encode, out_schema
    )
