"""Per-partition lineage (north rule: every stage writes lineage rows).

Schema mirrors the reference's SitemapCrawlStats counters
(/root/reference/pkg/stats.go:75-99) re-expressed per (stage, partition):
(stage, partition_key, urls_in, triples_out, parse_failures, seconds).
"""

from __future__ import annotations

import time

from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("urls_in", T.LongType()),
        T.StructField("triples_out", T.LongType()),
        T.StructField("parse_failures", T.LongType()),
        T.StructField("seconds", T.DoubleType()),
    ]
)


class PartitionTimer:
    """Context helper used inside mapInPandas to produce one lineage row per
    physical partition without a separate pass over the data."""

    def __init__(self, stage: str, partition_key: str = ""):
        self.stage = stage
        self.partition_key = partition_key
        self.urls_in = 0
        self.triples_out = 0
        self.parse_failures = 0
        self._start = time.monotonic()

    def row(self) -> dict:
        return {
            "stage": self.stage,
            "partition_key": self.partition_key,
            "urls_in": self.urls_in,
            "triples_out": self.triples_out,
            "parse_failures": self.parse_failures,
            "seconds": time.monotonic() - self._start,
        }
