"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side column expressions where possible so
the hot path stays in whole-stage codegen; the winnowing fingerprint uses a
numpy Arrow UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = r"[^a-zA-Z0-9]+"

# marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "es"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "une", "pour", "qui"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by", "be"]


def tokens_col(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )


def token_count(text_col: str) -> Column:
    """Whitespace/punctuation token count (the BPE-ish proxy: tokens plus a
    length-derived subword correction)."""
    toks = tokens_col(text_col)
    subword_extra = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.when(F.length(t) > 8, (F.length(t) / 4).cast("long")).otherwise(0),
    )
    return (F.size(toks) + subword_extra).alias("token_count")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length, punctuation ratio, stopword ratio, mean word length, and a
    composite quality score in [0,1]."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    stop_hits = F.size(F.array_intersect(toks, F.lit(EN_STOPWORDS).cast("array<string>")))
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n_tokens,
    ).otherwise(0.0)
    out = df.withColumn("n_chars_m", n_chars).withColumn("n_tokens", n_tokens)
    out = out.withColumn(
        "punct_ratio", F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    )
    out = out.withColumn(
        "stopword_ratio",
        F.when(n_tokens > 0, stop_hits / F.least(n_tokens, F.lit(len(EN_STOPWORDS)))).otherwise(0.0),
    )
    out = out.withColumn("mean_word_len", mean_word_len)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.col("stopword_ratio") * 0.3
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 8), 0.2).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.2, 0.1).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 4))


def lang_scores(text_col: str) -> list[Column]:
    toks = tokens_col(text_col)
    cols = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(markers))
        )
        cols.append(hits.alias(f"score_{lang}"))
    return cols


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word voting language ID; 'und' when nothing matches."""
    scored = df.select("*", *lang_scores(text_col))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first max wins, deterministic order
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred)


def fingerprint_exprs(text_col: str) -> Column:
    """Deterministic content fingerprint: md5 of the sorted distinct token
    set — engine-portable (same value in DuckDB SQL)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text_col))))
    ).alias("fingerprint")


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing (local-minimum rolling-hash selection) — the standard
    document fingerprint for near-dup/plagiarism detection. One Arrow UDF,
    output (id, fingerprint_hash) rows, joinable on the hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, prints = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").lower().split() if t]
                if len(toks) < k:
                    continue
                hashes = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(" ".join(toks[i : i + k]).encode()).digest()[:8],
                            "big",
                        ) & 0x7FFFFFFFFFFFFFFF
                        for i in range(len(toks) - k + 1)
                    ],
                    dtype=np.int64,
                )
                if len(hashes) <= window:
                    selected = {int(hashes.min())}
                else:
                    view = np.lib.stride_tricks.sliding_window_view(hashes, window)
                    selected = set(view.min(axis=1).tolist())
                for h in selected:
                    ids.append(int(doc_id))
                    prints.append(h)
            yield pd.DataFrame({"id": ids, "fingerprint_hash": prints})

    return df.select(id_col, text_col).mapInPandas(
        batches, "id long, fingerprint_hash long"
    )
