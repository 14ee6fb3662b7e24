"""End-to-end webtext curation: crawled pages -> training-ready documents.

The flagship composition of the training-data operators, in the order a
production corpus build runs them:

    pages (url, html)
      -> main-content extraction   (functions/html_text, jusText-lite)
      -> mojibake repair           (operators/encoding)
      -> unicode hygiene           (textstats.clean_text: NFC, controls, ws)
      -> language ID + gopher quality gates   (annotate, then filter)
      -> exact dedup               (content-hash canonical)
      -> near-dup dedup            (MinHash LSH -> cluster survivors)
      -> optional per-host cap     (linkgraph.stratified_cap)

Scale shape: stages 1-4 are ONE fused narrow pass each (no shuffle); the
funnel report for the gate stages comes from a single aggregation over the
annotated frame — not a .count() per stage — so the report costs one job,
and the only shuffles in the whole flow are the dedup ones (content-hash
groupBy, LSH band join, CC pointer jumping) plus the optional cap's window.
Dropped-bucket accounting from the LSH stage is surfaced in the report via
the Observation API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F


def docs_from_pages(pages: DataFrame) -> DataFrame:
    """(doc_id, url, text) from crawled (url, html): main-content
    extraction with a deterministic 64-bit id (xxhash64 of the url)."""
    from .functions.html_text import pages_to_text

    out = pages_to_text(pages)
    return out.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        F.col("main_text").alias("text"),
        "blocks_kept",
        "blocks_dropped",
    )


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = None,
    near_dup_threshold: float = 0.7,
    cap_per_host: int | None = None,
    host_col: str = "url",
) -> tuple[DataFrame, dict]:
    """Run the gate + dedup funnel over (id, text[, url]) documents.
    Returns (curated DataFrame, report dict with per-stage counts)."""
    from .operators.dedup import dedup_survivors, exact_dedup, minhash_dedup
    from .operators.encoding import fix_mojibake
    from .operators.textstats import clean_text, gopher_quality_flags, lang_id

    other_cols = [c for c in docs.columns if c not in (id_col, text_col)]

    # stages 2-3: repair + hygiene, narrow passes joined back on id
    fixed = fix_mojibake(docs, id_col, text_col).select(
        F.col(id_col), F.col("fixed").alias(text_col), "repair_rounds"
    )
    cleaned = (
        clean_text(fixed, id_col, text_col)
        .select(F.col(id_col), F.col("clean_text").alias(text_col))
        .join(fixed.select(id_col, "repair_rounds"), id_col)
    )
    if other_cols:
        cleaned = cleaned.join(docs.select(id_col, *other_cols), id_col)

    # stages 4-5: ANNOTATE both gates, then ONE aggregation for the funnel
    # (no per-stage .count() jobs), then filter
    annotated = (
        lang_id(cleaned, text_col)
        .select(cleaned.columns + ["lang_pred"])
        .join(
            gopher_quality_flags(cleaned, id_col, text_col).select(
                id_col, "gopher_pass"
            ),
            id_col,
        )
        .withColumn(
            "lang_ok",
            F.lit(True) if lang is None else (F.col("lang_pred") == lang),
        )
        .cache()
    )
    funnel = annotated.agg(
        F.count("*").alias("n_input"),
        F.sum(F.when(F.col("repair_rounds") > 0, 1).otherwise(0)).alias(
            "n_mojibake_repaired"
        ),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("n_lang_ok"),
        F.sum(
            F.when(F.col("lang_ok") & F.col("gopher_pass"), 1).otherwise(0)
        ).alias("n_quality_ok"),
    ).first()

    gated = annotated.filter(F.col("lang_ok") & F.col("gopher_pass"))

    # stage 6: exact dedup — keep the canonical (min id) per content hash
    canon = exact_dedup(gated, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    uniq = gated.join(canon, id_col, "left_semi").cache()
    n_exact_unique = uniq.count()

    # stage 7: near-dup dedup with dropped-bucket accounting
    obs = Observation("curate_lsh_dropped")
    pairs = minhash_dedup(
        uniq, id_col, text_col, threshold=near_dup_threshold, observation=obs
    )
    survivors = dedup_survivors(uniq, pairs, id_col)

    # stage 8: optional per-host cap
    if cap_per_host is not None and host_col in survivors.columns:
        from .operators.linkgraph import stratified_cap

        with_host = survivors.withColumn(
            "_host", F.parse_url(F.col(host_col), F.lit("HOST"))
        )
        survivors = stratified_cap(
            with_host, id_col, "_host", cap=cap_per_host
        ).drop("_host")

    survivors = survivors.cache()
    n_out = survivors.count()
    try:
        dropped = dict(obs.get)
    except Exception:
        # AQE empty-result edge (see dedup._observe_dropped) or no action
        dropped = {"dropped_buckets": None, "dropped_members": None}
    report = {
        "n_input": funnel["n_input"],
        "n_mojibake_repaired": funnel["n_mojibake_repaired"],
        "n_lang_ok": funnel["n_lang_ok"],
        "n_quality_ok": funnel["n_quality_ok"],
        "n_exact_unique": n_exact_unique,
        "n_near_dup_removed": n_exact_unique - n_out
        if cap_per_host is None
        else None,
        "n_curated": n_out,
        "lsh_dropped_buckets": dropped.get("dropped_buckets"),
        "lsh_dropped_members": dropped.get("dropped_members"),
    }
    return survivors.drop("lang_ok", "gopher_pass"), report


def curate_pages(
    spark: SparkSession, pages: DataFrame, **kwargs
) -> tuple[DataFrame, dict]:
    """pages (url, html) -> curated docs + report: the full crawl-to-corpus
    path."""
    return curate_corpus(docs_from_pages(pages), **kwargs)
