"""Training-shard export: token-budgeted shard assignment + JSONL output.

The last step of a corpus build: deterministic, reproducible shard files of
~``target_tokens`` each, in a stable document order, as gzipped JSONL.

Shard assignment needs the EXACT global running token total in id order —
the textbook scalable prefix sum, NOT a single-partition window:

  1. range-partition by id (Spark's range partitioner samples boundaries,
     so partitions are balanced) and sort within partitions;
  2. per-partition token subtotals — a tiny driver-side list (one row per
     partition), prefix-summed into per-partition offsets;
  3. each partition's window cumsum + its offset = the exact global cumsum
     with NO global shuffle and no 1-partition bottleneck.

``shard = floor((global_cumsum - 1) / target)``: a document lands in the
shard where its LAST token falls, so every shard except the final one holds
at least ``target`` tokens and overshoot is bounded by one document.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window, functions as F


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    *,
    target_tokens: int = 1 << 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns + ``shard`` (0-based) by exact global token cumsum
    in ``id_col`` order."""
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        # PINNED: repartitionByRange samples its boundaries per execution,
        # and the subtotal job and the returned plan are separate
        # executions — without persisting, rows could land in a different
        # _pid than the one their offset was computed under. The persist
        # materializes one boundary sample both jobs share.
        .persist()
    )
    # tiny relation: one row per partition — prefix-sum on the driver
    subtotals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    off_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("_cum", F.col("_offset") + F.sum(token_col).over(w))
        .withColumn(
            "shard",
            F.floor((F.col("_cum") - 1) / F.lit(target_tokens)).cast("int"),
        )
        .drop("_pid", "_offset", "_cum")
    )


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
    *,
    target_tokens: int = 1 << 20,
) -> dict:
    """Write ``shard=N/`` directories of gzipped JSONL ({"id","text",
    "n_tokens"} per line) plus a ``manifest.json`` with per-shard row and
    token counts. Executors write; the driver only writes the manifest."""
    sharded = assign_shards(
        df, id_col, token_col, target_tokens=target_tokens
    ).cache()
    lines = sharded.select(
        "shard",
        F.to_json(
            F.struct(
                F.col(id_col).alias("id"),
                F.col(text_col).alias("text"),
                F.col(token_col).alias("n_tokens"),
            )
        ).alias("value"),
    )
    lines.write.mode("overwrite").partitionBy("shard").option(
        "compression", "gzip"
    ).text(os.path.join(out_dir, "data"))
    stats = (
        sharded.groupBy("shard")
        .agg(F.count("*").alias("rows"), F.sum(token_col).alias("tokens"))
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "target_tokens": target_tokens,
        "shards": [
            {"shard": r["shard"], "rows": r["rows"], "tokens": r["tokens"]}
            for r in stats
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    sharded.unpersist()
    return manifest
