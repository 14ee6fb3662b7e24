"""Bucketed co-located joins: the plan gate proving the layout deletes the
shuffle (the 100-TB repeated-join play — SCALING.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nabu_spark.operators.bucketing import (
    is_bucketed_join_shuffle_free,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def frames(spark):
    old = spark.range(0, 5000).select(
        F.col("id").alias("prov"), (F.col("id") * 2).alias("v_old")
    )
    new = spark.range(2500, 7500).select(
        F.col("id").alias("prov"), (F.col("id") * 3).alias("v_new")
    )
    yield old, new
    for t in ("b_old", "b_new"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _write_both(old, new, tmp_path):
    write_bucketed(old, "b_old", key="prov", buckets=8,
                   path=str(tmp_path / "b_old"))
    write_bucketed(new, "b_new", key="prov", buckets=8,
                   path=str(tmp_path / "b_new"))


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, frames, tmp_path):
        old, new = frames
        _write_both(old, new, tmp_path)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "b_old").join(
                read_table(spark, "b_new"), "prov"
            )
            assert is_bucketed_join_shuffle_free(j), (
                j._jdf.queryExecution().executedPlan().toString()
            )
            assert j.count() == 2500
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_plain_parquet_join_shuffles(self, spark, frames, tmp_path):
        """The control: without the bucketed layout the same join pays
        Exchange on both sides — the delta IS the feature."""
        old, new = frames
        old.write.parquet(str(tmp_path / "p_old"))
        new.write.parquet(str(tmp_path / "p_new"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.read.parquet(str(tmp_path / "p_old")).join(
                spark.read.parquet(str(tmp_path / "p_new")), "prov"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_anti_join_incremental_skip_shape(self, spark, frames, tmp_path):
        """The incremental-sync anti-join (stats.incremental_skip shape)
        also runs shuffle-free on the bucketed layout."""
        old, new = frames
        _write_both(old, new, tmp_path)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            todo = read_table(spark, "b_new").join(
                read_table(spark, "b_old"), "prov", "left_anti"
            )
            assert is_bucketed_join_shuffle_free(todo)
            assert todo.count() == 2500
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
