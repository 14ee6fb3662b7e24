"""Crawl-stats aggregation, circuit breaker, warning caps, duplicate-key
detection, incremental skip, and cleanup — the relational operators around
the KG core (SURVEY.md §2 #19, #26-30, #36).

All pure DataFrame ops; semantics mirrored from the reference:
  * SitemapCrawlStats counters (pkg/stats.go:75-99, sitemap.go:200-313)
  * warning cap = first 20 per sitemap (sitemap.go:258-273)
  * circuit breaker: >= threshold failures with zero successes
    (helpers.go:107-154; batch semantics make early-exit an optimization)
  * duplicate storage keys are flagged, not dropped (sitemap.go:274-284)
  * incremental skip = left anti-join on (key, content hash)
    (hash_checks/hash_check.go:34-122)
  * cleanup = stored keys minus current url-set (storage/storage.go:75-148)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WARNING_CAP = 20
CIRCUIT_BREAKER_THRESHOLD = 20


def crawl_stats(docs: DataFrame, *, group_col: str = "sitemap_id") -> DataFrame:
    """Per-sitemap crawl report: sites in sitemap, successes, failures,
    capped failure list, dataset_down flag."""
    return (
        docs.groupBy(group_col)
        .agg(
            F.count("*").alias("sites_in_sitemap"),
            F.count(F.when(F.col("error_code") == "", 1)).alias("successful_sites"),
            F.count(F.when(F.col("error_code") != "", 1)).alias("crawl_failures"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("error_code") != "",
                            F.struct("url", "error_code"),
                        )
                    )
                ),
                1,
                WARNING_CAP,
            ).alias("failure_sample"),
        )
        .withColumn(
            "dataset_down",
            (F.col("successful_sites") == 0)
            & (F.col("crawl_failures") >= CIRCUIT_BREAKER_THRESHOLD),
        )
    )


def duplicate_keys(docs: DataFrame, key_col: str = "obj_key") -> DataFrame:
    """Two URLs resolving to the same storage path -> error rows (flagged,
    never silently dropped)."""
    return (
        docs.groupBy(key_col)
        .agg(F.count("*").alias("n_docs"), F.collect_list("url").alias("urls"))
        .filter(F.col("n_docs") > 1)
    )


def incremental_skip(
    new_docs: DataFrame, existing: DataFrame, key_col: str = "obj_key"
) -> DataFrame:
    """Docs that still need processing: anti-join on (key, md5(doc)).
    Unchanged content is skipped; changed content under the same key is
    re-processed (the md5-vs-ETag HEAD check, distributed)."""
    new_hashed = new_docs.withColumn("_h", F.md5(F.col("doc")))
    existing_hashed = existing.select(
        F.col(key_col), F.md5(F.col("doc")).alias("_h")
    )
    return new_hashed.join(existing_hashed, [key_col, "_h"], "left_anti").drop("_h")


def cleanup_list(stored: DataFrame, current: DataFrame, key_col: str = "obj_key") -> DataFrame:
    """Stored objects no longer present in the current url-set -> delete list."""
    return stored.select(key_col).distinct().join(
        current.select(key_col).distinct(), key_col, "left_anti"
    )
