"""Byte-pair-encoding tokenizer: distributed-count training, broadcast apply.

The standard subword tokenizer of LLM data pipelines (Sennrich et al. 2016,
the HuggingFace/GPT-2 training shape):

  * ``train_bpe`` — ONE distributed aggregation produces the word-frequency
    table (vocabulary-sized under Zipf, NOT corpus-sized — this is the same
    reduction HuggingFace's trainer does before its in-memory merge loop);
    the driver then runs the classic merge iteration over that table:
    repeatedly merge the most frequent adjacent symbol pair (deterministic
    lexicographic tie-break). Corpus bytes are touched exactly once.
  * ``bpe_encode`` — distributed application: the merges ride along as a
    broadcast rank table; each Arrow batch encodes its tokens with the
    greedy lowest-rank-first algorithm, memoized per DISTINCT word (web
    vocabularies repeat massively, so each worker encodes a word once).
  * ``bpe_decode_expr`` — decoding is pure concatenation (JVM column expr).

No portable SQL equivalent exists (training is an iterative argmax loop),
so this operator is pytest-verified: hand-worked merge sequences, a
driver-vs-distributed equivalence gate, and roundtrip identity.

Scale notes (100 TB): training reads the corpus once (map-side-combined
word counts, one shuffle on the word key, capped at ``max_words`` by
frequency); the merge loop runs over at most ``max_words`` entries on the
driver — the same bound every production BPE trainer accepts. Encoding is
embarrassingly parallel with only the merge table (vocab_size rows)
broadcast.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .textstats import tokens_col

END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str, *, max_words: int = 100_000
) -> list[tuple[str, int]]:
    """(word, count) sorted by count desc then word — the training
    reduction. ``max_words`` caps the driver-side table (rank by frequency,
    deterministic tie-break); the cap is the standard trainer bound, and the
    dropped tail is exactly the words rare enough to be fully split by the
    learned merges anyway."""
    counts = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
    )
    return [(r["w"], r["c"]) for r in counts.collect()]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + c
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, c in vocab.items():
        res = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + c
    return out


def train_bpe_from_frequencies(
    freqs: list[tuple[str, int]], *, n_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table. Deterministic:
    the argmax pair ties break lexicographically. Stops early when no pair
    reaches ``min_pair_freq``."""
    vocab = {tuple(list(w) + [END]): c for w, c in freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 200,
    max_words: int = 100_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Distributed-count + driver-merge BPE training (one corpus scan)."""
    return train_bpe_from_frequencies(
        word_frequencies(df, text_col, max_words=max_words),
        n_merges=n_merges,
        min_pair_freq=min_pair_freq,
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the GPT-2
    ``bpe()`` shape)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) — distributed application with a
    per-worker memo over distinct words."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .dedup import tokens_of

        memo: dict[str, list[str]] = {}
        for pdf in it:
            ids, pieces, counts = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in tokens_of(text or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                ids.append(doc_id)
                pieces.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "pieces": pieces, "n_pieces": counts}
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} long, pieces array<string>, n_pieces long"
    )


def bpe_decode_expr(pieces_col: str):
    """Decode = concatenate pieces and turn the end-of-word marker back
    into spaces — a pure JVM expression."""
    return F.trim(
        F.regexp_replace(
            F.concat_ws("", F.col(pieces_col)), F.lit(END), F.lit(" ")
        )
    )
