"""Exact substring (span) deduplication — the ExactSubstr technique of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", public): any >=k-token span that occurs more than once in the
corpus is duplicated text; remove the tokens it covers.

Distributed shape (the practical alternative to that paper's single-node
suffix array): one narrow pass explodes every k-gram anchor position
(O(total_tokens) rows of (key, doc_id, pos) — token text never fans out,
the gram key is built JVM-side from an array slice), ONE shuffle groups by
gram key to find duplicated grams, a join brings the duplicated anchor
positions back, and the token-interval union + text rebuild are
higher-order array functions (filter with index lambda) — zero Python.

Semantics (documented variant): ALL occurrences of a duplicated k-gram are
removed, including the first — the conservative remove-all rule, simpler
and cluster-size-independent (keep-one requires electing a canonical
occurrence; at 100 TB that's an extra min-by shuffle of (gram, doc, pos)
— noted, not implemented). Within-doc repeats count as duplicates.

The gram key here is the exact token sequence (unit-separator join) so the
DuckDB oracle is exact; at 100 TB you would xxhash64 the slice instead
(64-bit collisions are ~1e-9 at 1e12 grams) — one-line swap, noted below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def duplicated_span_positions(
    docs: DataFrame, *, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos) anchor positions of every k-gram whose exact token
    sequence occurs >= 2 times corpus-wide."""
    toks = docs.select(F.col(id_col).alias("__id"), _tokens(text_col).alias("__t"))
    # sequence(0, n-k) is only valid when n >= k (Spark's sequence would
    # happily count DOWN otherwise)
    anchors = (
        toks.filter(F.size("__t") >= k)
        .select(
            "__id",
            "__t",
            F.explode(F.sequence(F.lit(0), F.size("__t") - k)).alias("pos"),
        )
        .select(
            "__id",
            "pos",
            # exact gram key; swap for xxhash64(...) at petabyte scale
            F.concat_ws(SEP, F.slice("__t", F.col("pos") + 1, k)).alias("gram"),
        )
    )
    dup_grams = (
        anchors.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gram")
    )
    return anchors.join(dup_grams, "gram").select(
        F.col("__id").alias(id_col), "pos"
    )


def remove_duplicate_spans(
    docs: DataFrame, *, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rebuild each document without the tokens covered by any duplicated
    k-gram occurrence. Adds ``dedup_text``, ``n_tokens``, ``n_removed``."""
    anchors = duplicated_span_positions(docs, k=k, text_col=text_col, id_col=id_col)
    covered = (
        anchors.select(
            id_col, F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("tp")
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_set("tp").alias("__covered"))
    )
    toks = _tokens(text_col)
    out = docs.join(covered, id_col, "left").withColumn(
        "__covered", F.coalesce("__covered", F.array().cast("array<int>"))
    )
    kept = F.filter(
        toks, lambda x, i: ~F.array_contains(F.col("__covered"), i)
    )
    return (
        out.withColumn("dedup_text", F.array_join(kept, " "))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("n_removed", F.size("__covered"))
        .drop("__covered")
    )
