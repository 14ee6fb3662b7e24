"""Bucketed-table layout for shuffle-free co-located joins.

The 100-TB play the ad-hoc shuffle join can't make: quads, release diffs,
entity links, and incremental-skip anti-joins all key on the same columns
round after round. Writing both sides bucketed (and sorted) by that key
lets EVERY subsequent equi-join run with ZERO Exchange — Spark reads
matching buckets pairwise; at 1000 executors that deletes the single
biggest repeated cost of an incremental sync (re-shuffling the full quad
corpus per release).

Spark-native mechanics (no Hive): ``bucketBy(n, key).sortBy(key)`` +
``saveAsTable`` registers the layout in the session catalog; the reader
picks the bucketed scan automatically. The plan gate
(`tests/test_bucketing.py`) asserts a join of two bucketed tables contains
NO shuffle, and that the same join on plain parquet does — the delta IS the
feature.

Bucket-count choice at scale: buckets ≈ corpus_bytes / 256 MB, fixed ONCE
per table family (both sides must match for the co-located join); skew on
the bucket key is the same hash-skew story as any shuffle, so key on
uniform hashes (prov URNs, content hashes), not raw hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str | list[str],
    buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``.
    ``path`` makes it an external table (data at an explicit location
    instead of the session warehouse dir — which is a static conf)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.mode(mode)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_bucketed_join_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan for ``joined`` contains no SHUFFLE —
    the co-location check callers can assert in their own pipelines.
    BroadcastExchange does not count: a broadcast join moves no corpus
    rows, and a small dimension side broadcasting is exactly what should
    happen next to a bucketed fact table."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") == plan.count("BroadcastExchange")
