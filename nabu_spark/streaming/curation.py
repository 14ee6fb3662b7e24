"""Streaming webtext curation: new crawl files -> curated-doc appends.

The streaming formulation of `nabu_spark.curate`: page files landing in a
directory flow through the STATELESS stages of the funnel, then streaming
EXACT dedup on the cleaned content hash via
``dropDuplicatesWithinWatermark`` (seen-hash state bounded by event time),
and append to the curated table with exactly-once file-sink semantics.

Streaming changes the COMPOSITION, not the kernels: the batch funnel
re-joins narrow stage outputs on doc_id, but a self-join of two streaming
frames is a stream-stream join (watermarks both sides, state forever) — so
here the text stages run as ONE fused Arrow pass carrying (url, ts) through
(`extract_main_text` -> `fix_text` -> the clean_text kernel), and the
language/Gopher gates apply as inline codegen expressions
(`textstats.lang_scores` / `gopher_exprs`) on the same frame. Zero joins,
one stateful operator (the dedup), doc-local everything else.

Honest boundary: NEAR-dup dedup (MinHash clustering) is inherently a
cross-corpus batch computation — its candidate graph spans the whole
history, which no watermark can bound — so the streaming path stops at
exact dedup and the batch `curate_corpus` runs periodically over the
accumulated table for near-dup sweeps (the standard lambda split for
corpus builds).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def _extract_fix_clean(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..curate import fix_clean_kernel
    from ..functions.html_text import extract_main_text

    for pdf in it:
        texts = []
        for body in pdf["html"]:
            try:
                t, _, _ = extract_main_text(body)
            except Exception:
                t = ""
            texts.append(fix_clean_kernel(t)[0])
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "text": pd.Series(texts, dtype="object"),
            }
        )


def curated_docs_stream(
    pages: DataFrame, *, lang: str | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """pages stream (url, warc_ts, html) -> gated, exact-deduped curated
    docs stream (doc_id, url, warc_ts, text, lang_pred, n_tokens)."""
    from ..operators.textstats import (
        gopher_exprs, lang_pred_expr, lang_scores, tokens_col,
    )

    docs = pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_fix_clean, "url string, warc_ts timestamp, text string"
    )
    # stage the token array once — the gates re-tokenize per rule otherwise
    # (interpreted higher-order functions; see textstats note)
    staged = docs.select("*", tokens_col("text").alias("_toks"))
    e = gopher_exprs("text", toks=F.col("_toks"))
    scored = staged.select(
        "url", "warc_ts", "text", "_toks",
        *lang_scores("text", toks=F.col("_toks")),
    )
    gated = (
        scored.withColumn("lang_pred", lang_pred_expr())
        .select("url", "warc_ts", "text", "_toks", "lang_pred")
        .withColumn("n_tokens", e["n_tokens"])
        .withColumn("gopher_pass", e["gopher_pass"])
        .drop("_toks")
        .filter(F.col("gopher_pass"))
        .drop("gopher_pass")
        .withColumn("doc_id", F.xxhash64("url"))
    )
    if lang is not None:
        gated = gated.filter(F.col("lang_pred") == lang)
    return (
        gated.withColumn("content_hash", F.md5("text"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("content_hash")
        .select("doc_id", "url", "warc_ts", "text", "lang_pred", "n_tokens")
    )


def start_streaming_curation(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    lang: str | None = None,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Append curated docs for new page files exactly once."""
    from .incremental import read_pages_stream

    pages = read_pages_stream(spark, pages_dir)
    curated = curated_docs_stream(pages, lang=lang, watermark=watermark)
    writer = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
