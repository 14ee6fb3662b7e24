"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (pages -> quads)
over a deterministic page corpus derived from /root/testdata/sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) on the driver's parquet tables, and
``oracle_sql()`` gives the DuckDB-equivalent SQL for the value-hash gate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (extract -> toRdf -> skolemize -> URN-tag)
    over pages synthesized from sf0.001 documents; returns the quads DF."""
    from nabu_spark.pipeline import pages_to_quads_fused
    from nabu_spark.sources.documents import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    quads = pages_to_quads_fused(pages, salt=False)
    return quads.filter(F.col("error_code").isNull()).select(
        "subj", "pred", "obj", "prov"
    )


# ---------------------------------------------------------------------------
# queries / oracles
#
# Column names are aliased identically on both sides; every aggregate/computed
# column gets an explicit alias. Floating-point results are rounded on both
# sides where exact binary equality is not guaranteed across engines.
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (SURVEY §2 #19/#29 family): canonical
    representative + duplicate count per distinct text."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("dup_count"),
        )
        .orderBy("text_hash")
    )


def q_duplicate_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-document detection (sitemap.go:274-284 semantics): keys
    resolving to the same storage path are flagged, not silently dropped."""
    docs = _load(spark, sf_dir, "documents")
    keyed = docs.withColumn(
        "obj_key",
        F.concat(
            F.lit("summoned/"),
            F.col("source"),
            F.lit("/"),
            F.base64(F.col("text").cast("binary")),
            F.lit(".jsonld"),
        ),
    )
    return (
        keyed.groupBy("obj_key")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .agg(F.count("*").alias("duplicate_keys"), F.sum("n_docs").alias("docs_involved"))
    )


def q_urn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URN formation (urn.go:31-49): '/'->':' path serialization + validity
    filter (no empty, must contain '/', no '//')."""
    docs = _load(spark, sf_dir, "documents")
    keyed = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("summoned/"), F.col("source"), F.lit("/"), F.col("doc_id")).alias(
            "obj_key"
        ),
    )
    return keyed.select(
        "doc_id",
        F.concat(F.lit("urn:iow:"), F.regexp_replace("obj_key", "/", ":")).alias("urn"),
    ).orderBy("doc_id")


def q_incremental_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental hash-skip as a left anti-join (hash_check.go:34-122 ->
    SURVEY §2 #29): orders with no lineitem yet 'need harvesting'."""
    orders = _load(spark, sf_dir, "orders")
    lineitem = _load(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem.select("l_orderkey"), orders.o_orderkey == lineitem.l_orderkey, "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_cleanup_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outdated-doc cleanup (storage.go:75-148 -> §2 #30): stored keys not in
    the current url-set are the delete list."""
    lineitem = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    # 'stored' = all lineitem orderkeys; 'current' = orders placed after a date
    current = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))
    ).select("o_orderkey")
    return (
        lineitem.select(F.col("l_orderkey").alias("stored_key"))
        .distinct()
        .join(current, F.col("stored_key") == current.o_orderkey, "left_anti")
        .orderBy("stored_key")
    )


def q_crawl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-stats aggregation (§2 #26): per-group counts + conditional
    failure counts + wall-time stand-in."""
    events = _load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("sites_contacted"),
            F.count(F.when(F.col("value") > 50.0, 1)).alias("successful_sites"),
            F.count(F.when(F.col("value") <= 50.0, 1)).alias("crawl_failures"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


def q_circuit_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-down circuit breaker (§2 #27): zero successes AND >= threshold
    failures -> dataset_down, evaluated per group post-hoc."""
    events = _load(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count(F.when(F.col("value") > 300.0, 1)).alias("successes"),
        F.count(F.when(F.col("value") <= 300.0, 1)).alias("failures"),
    )
    return (
        per_user.withColumn(
            "dataset_down",
            (F.col("successes") == 0) & (F.col("failures") >= 20),
        )
        .filter(F.col("dataset_down"))
        .select("user_id", "successes", "failures")
        .orderBy("user_id")
    )


def q_multihop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop traversal as chained joins (§2 #31, triples_lib.rs:115-133):
    region -> nation -> customer -> orders with per-hop predicates."""
    region = _load(spark, sf_dir, "region")
    nation = _load(spark, sf_dir, "nation")
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, region.r_regionkey == nation.n_regionkey)
        .join(customer, nation.n_nationkey == customer.c_nationkey)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("n_name")
    )


def q_warning_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warning cap (§2 #36, sitemap.go:258-273): keep only the first 20
    warnings per group, deterministic order."""
    events = _load(spark, sf_dir, "events")
    warn = events.filter(F.col("value") < 10.0)
    return (
        warn.groupBy("event_type")
        .agg(
            F.slice(F.sort_array(F.collect_list("event_id")), 1, 20).alias("first_warnings"),
            F.count("*").alias("total_warnings"),
        )
        .select(
            "event_type",
            F.col("total_warnings"),
            F.size("first_warnings").alias("kept_warnings"),
            F.element_at("first_warnings", 1).alias("first_warning_id"),
        )
        .orderBy("event_type")
    )


def q_bytesum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-agnostic bytesum (§2 #25, hash.go:29-51): commutative sum of
    UTF-8 byte values per source partition — an exact distributed agg."""
    docs = _load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.aggregate(
            F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("doc_sum"),
    )
    return (
        per_doc.groupBy("source")
        .agg(F.sum("doc_sum").alias("bytesum"))
        .orderBy("source")
    )


def q_release_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-name routing (§2 #33, helpers.go:29-52) as when/otherwise."""
    docs = _load(spark, sf_dir, "documents")
    prefixed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("summoned/"), F.col("source")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("prov/"), F.col("source")))
        .otherwise(F.lit("orgs/"))
        .alias("prefix"),
    )
    return prefixed.select(
        "doc_id",
        F.when(
            F.col("prefix").startswith("summoned/"),
            F.concat(F.regexp_extract("prefix", "^summoned/(.*)$", 1), F.lit("_release.nq")),
        )
        .when(
            F.col("prefix").startswith("prov/"),
            F.concat(F.regexp_extract("prefix", "^prov/(.*)$", 1), F.lit("_prov.nq")),
        )
        .otherwise(F.lit("organizations.nq"))
        .alias("release_name"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup": q_exact_dedup,
        "duplicate_key_detection": q_duplicate_key_detection,
        "urn_encode": q_urn_encode,
        "incremental_skip": q_incremental_skip,
        "cleanup_set_difference": q_cleanup_set_difference,
        "crawl_stats": q_crawl_stats,
        "circuit_breaker": q_circuit_breaker,
        "multihop_join": q_multihop_join,
        "warning_cap": q_warning_cap,
        "bytesum": q_bytesum,
        "release_naming": q_release_naming,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            SELECT md5(text) AS text_hash,
                   min(doc_id) AS canonical_doc_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1 ORDER BY text_hash
        """,
        "duplicate_key_detection": """
            WITH keyed AS (
              SELECT 'summoned/' || source || '/' || to_base64(text::BLOB) || '.jsonld' AS obj_key
              FROM documents
            ), dups AS (
              SELECT obj_key, count(*) AS n_docs FROM keyed GROUP BY 1 HAVING count(*) > 1
            )
            SELECT count(*) AS duplicate_keys, sum(n_docs) AS docs_involved FROM dups
        """,
        "urn_encode": """
            SELECT doc_id,
                   'urn:iow:' || replace('summoned/' || source || '/' || doc_id, '/', ':') AS urn
            FROM documents ORDER BY doc_id
        """,
        "incremental_skip": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
            ORDER BY o_orderkey
        """,
        "cleanup_set_difference": """
            SELECT DISTINCT l_orderkey AS stored_key
            FROM lineitem
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_orderdate >= DATE '1999-01-01' AND o.o_orderkey = l_orderkey
            )
            ORDER BY stored_key
        """,
        "crawl_stats": """
            SELECT event_type,
                   count(*) AS sites_contacted,
                   count(CASE WHEN value > 50.0 THEN 1 END) AS successful_sites,
                   count(CASE WHEN value <= 50.0 THEN 1 END) AS crawl_failures,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "circuit_breaker": """
            WITH per_user AS (
              SELECT user_id,
                     count(CASE WHEN value > 300.0 THEN 1 END) AS successes,
                     count(CASE WHEN value <= 300.0 THEN 1 END) AS failures
              FROM events GROUP BY user_id
            )
            SELECT user_id, successes, failures
            FROM per_user WHERE successes = 0 AND failures >= 20
            ORDER BY user_id
        """,
        "multihop_join": """
            SELECT n_name,
                   count(*) AS order_count,
                   round(sum(o_totalprice), 2) AS revenue
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name ORDER BY n_name
        """,
        "warning_cap": """
            WITH warn AS (
              SELECT event_type, event_id FROM events WHERE value < 10.0
            ), agg AS (
              SELECT event_type,
                     list_sort(list(event_id)) AS all_ids,
                     count(*) AS total_warnings
              FROM warn GROUP BY event_type
            )
            SELECT event_type,
                   total_warnings,
                   least(total_warnings, 20) AS kept_warnings,
                   all_ids[1] AS first_warning_id
            FROM agg ORDER BY event_type
        """,
        "bytesum": """
            WITH per_doc AS (
              SELECT source,
                     (SELECT coalesce(sum(unicode(c)), 0)
                      FROM unnest(split(text, '')) AS t(c)) AS doc_sum
              FROM documents
            )
            SELECT source, sum(doc_sum) AS bytesum FROM per_doc GROUP BY source ORDER BY source
        """,
        "release_naming": """
            WITH prefixed AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'summoned/' || source
                          WHEN doc_id % 3 = 1 THEN 'prov/' || source
                          ELSE 'orgs/' END AS prefix
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN starts_with(prefix, 'summoned/')
                          THEN regexp_extract(prefix, '^summoned/(.*)$', 1) || '_release.nq'
                        WHEN starts_with(prefix, 'prov/')
                          THEN regexp_extract(prefix, '^prov/(.*)$', 1) || '_prov.nq'
                        ELSE 'organizations.nq' END AS release_name
            FROM prefixed ORDER BY doc_id
        """,
    }
