"""Continuous rollup maintenance (hypertable-style): a foreachBatch
sink keeps a 1-day × event_type aggregate table incrementally up to
date as events stream in.

Pattern: each micro-batch is pre-aggregated (partial), unioned with the
current rollup state, and re-aggregated — a merge-style upsert without
requiring Delta. The rollup table is O(#windows × #types), so the
maintenance cost per batch is bounded by batch size + rollup size,
never by history. At 100 TB this is the difference between "query the
rollup" (ms) and "rescan the stream" (hours).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_SCHEMA = (
    "w_start timestamp, event_type string, n long, total_value double"
)


def _aggregate(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(
            F.date_trunc("day", "ts").alias("w_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def _merge(old: DataFrame, delta: DataFrame) -> DataFrame:
    # additive merge: counts add, decimal-backed sums add
    return (
        old.unionByName(delta)
        .groupBy("w_start", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum(F.col("total_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


class RollupMaintainer:
    """Owns the rollup table path and the foreachBatch updater."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet")
            for root, _, fs in os.walk(self.path)
            for f in fs
        ):
            return self.spark.read.schema(ROLLUP_SCHEMA).parquet(self.path)
        return self.spark.createDataFrame([], ROLLUP_SCHEMA)

    def update(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = _aggregate(batch_df)
        merged = _merge(self.read(), delta)
        # write-then-swap: land the new rollup next to the old, then rename
        tmp = f"{self.path}.tmp{epoch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
