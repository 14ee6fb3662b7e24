"""Adapt the driver's ``documents`` table to the ``pages`` input shape.

The sf* test dirs carry no HTML corpus, so for the driver contract we wrap
each document row into a deterministic Common-Crawl-style page: a JSON-LD
schema:Dataset embedded in an HTML head. Built entirely from JVM-side column
expressions (``to_json(struct(...))`` handles JSON escaping), no Python in
the construction path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import fan_out


# schema metadata memo (see __spark_entry__._load): skips the per-read
# one-task schema-inference job; row data is never cached
_SCHEMA_MEMO: dict[str, object] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    sch = _SCHEMA_MEMO.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, hash-spread when the scan is narrower than the
    core count: every page builder below feeds a per-row Python/codegen
    kernel downstream, and the sf fixtures are single-row-group files that
    would otherwise pin that kernel to ONE task (guide §2.5)."""
    return fan_out(load(spark, sf_dir, "documents"), "doc_id")


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    jsonld = F.to_json(
        F.struct(
            F.lit("https://schema.org/").alias("@context"),
            F.concat(
                F.lit("https://docs.example.org/corpus/"), F.col("doc_id")
            ).alias("@id"),
            F.lit("Dataset").alias("@type"),
            F.concat(F.lit("document "), F.col("doc_id")).alias("name"),
            F.substring(F.col("text"), 1, 200).alias("description"),
            F.col("lang").alias("inLanguage"),
            F.col("n_chars").alias("contentSize"),
        )
    )
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        jsonld,
        F.lit("</script></head><body></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://corpus"),
            F.pmod(F.col("doc_id"), F.lit(10)),
            F.lit(".example.org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        jsonld.alias("text"),
        F.col("lang").alias("lang"),
    )


def microdata_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose structured data is schema.org microdata (no JSON-LD) —
    the JSON-LD-free slice of the open web. Pure JVM column construction."""
    docs = _docs(spark, sf_dir)
    subj = F.concat(F.lit("https://docs.example.org/corpus/"), F.col("doc_id"))
    html = F.concat(
        F.lit('<html><head><title>doc</title></head><body>'
              '<div itemscope itemtype="https://schema.org/Dataset" itemid="'),
        subj,
        F.lit('"><h1 itemprop="name">document '),
        F.col("doc_id"),
        F.lit('</h1><meta itemprop="description" content="'),
        F.substring(F.col("text"), 1, 200),
        F.lit('"><meta itemprop="inLanguage" content="'),
        F.col("lang"),
        F.lit('"></div></body></html>'),
    )
    return docs.select(
        F.concat(
            F.lit("https://mdcorpus"),
            F.pmod(F.col("doc_id"), F.lit(10)),
            F.lit(".example.org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.lit("").alias("text"),
        F.col("lang").alias("lang"),
    )


def bnode_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose JSON-LD carries a NESTED provider organization (no @id)
    — each document yields exactly one blank node, so this slice exercises
    deterministic skolemization (functions/skolem.py, urn.go:83-116
    semantics) under the driver's DuckDB hash gate: the skolem sha256 is
    recomputable in SQL from the three context strings."""
    docs = _docs(spark, sf_dir)
    jsonld = F.to_json(
        F.struct(
            F.lit("https://schema.org/").alias("@context"),
            F.concat(
                F.lit("https://docs.example.org/corpus/"), F.col("doc_id")
            ).alias("@id"),
            F.lit("Dataset").alias("@type"),
            F.concat(F.lit("document "), F.col("doc_id")).alias("name"),
            F.struct(
                F.lit("Organization").alias("@type"),
                F.concat(F.lit("org "), F.pmod(F.col("doc_id"), F.lit(5))).alias("name"),
            ).alias("provider"),
        )
    )
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        jsonld,
        F.lit("</script></head><body></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://bncorpus"),
            F.pmod(F.col("doc_id"), F.lit(10)),
            F.lit(".example.org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        jsonld.alias("text"),
        F.col("lang").alias("lang"),
    )


def content_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with article-shaped HTML (nav chrome + headline + body text +
    link footer) for the main-text extraction path. Pure JVM column
    construction; the expected extraction output is a closed-form function
    of (doc_id, text), so the gate oracle recomputes it in SQL."""
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<html><head><title>doc</title><script>var x=1;</script></head>'
              '<body><nav><ul><li><a href="/">Home</a></li>'
              '<li><a href="/about">About</a></li></ul></nav>'
              '<h1>Document '),
        F.col("doc_id"),
        F.lit(' of the synthetic corpus</h1><p>'),
        F.col("text"),
        F.lit('</p><p>Tag cloud</p><div><p><a href="/tos">Terms of service '
              'legal link footer</a></p></div></body></html>'),
    )
    return docs.select(
        F.concat(
            F.lit("https://corpus"),
            F.pmod(F.col("doc_id"), F.lit(10)),
            F.lit(".example.org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        html.cast("binary").alias("html"),
    )
