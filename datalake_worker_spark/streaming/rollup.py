"""Continuous rollup maintenance (hypertable-style): a foreachBatch
sink keeps a 1-day × event_type aggregate incrementally up to date as
events stream in.

Exactly-once without a transactional table format: each micro-batch
writes its PARTIAL aggregate into an epoch-keyed partition
(``.../epoch=N/``) with overwrite mode — foreachBatch's at-least-once
replay of an epoch simply rewrites the same partition with the same
content, never double-counts. Reading the rollup folds the partials
(counts and decimal-backed sums are associative). ``compact()``
periodically folds historical epochs into one partition so the read
stays O(#windows), not O(#epochs).

At 100 TB this is the difference between "query the rollup" (ms) and
"rescan the stream" (hours); per-batch maintenance cost is bounded by
batch size, never history.
"""

from __future__ import annotations

import os
import shutil

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


def _fold(partials: DataFrame) -> DataFrame:
    # additive fold: counts add, decimal-backed sums add (associative,
    # so partials from any epoch split aggregate to the same totals)
    return (
        partials.groupBy("w_start", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum(F.col("total_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


class RollupMaintainer:
    """Owns the rollup partial store and the foreachBatch updater."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _has_data(self) -> bool:
        if not os.path.isdir(self.path):
            return False
        for root, _, fs in os.walk(self.path):
            if any(f.endswith(".parquet") for f in fs):
                return True
        return False

    def read(self) -> DataFrame:
        """The folded rollup (current totals)."""
        if not self._has_data():
            return self.spark.createDataFrame([], ROLLUP_SCHEMA)
        partials = self.spark.read.parquet(self.path).drop("epoch")
        return _fold(partials)

    def update(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Idempotent epoch write: a replayed batch overwrites its own
        partition with identical content (exactly-once effect). Write
        parallelism is size-derived, not pinned: the groupBy shuffle's
        output partitions are AQE-coalesced to the target partition
        size, so an epoch delta lands as one file at test scale but as
        bounded-N parallel files when per-batch group cardinality is
        100 TB-grain — never single-tasked through coalesce(1)."""
        delta = _aggregate(batch_df)
        delta.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch={epoch_id}")
        )

    def compact(self) -> None:
        """Fold all epoch partials into one partition (bounds read cost)."""
        if not self._has_data():
            return
        folded = self.read()
        tmp = f"{self.path}.compact"
        # the folded rollup is O(#windows) rows; AQE coalesces the fold
        # shuffle to a size-derived small file count (same reasoning as
        # update())
        folded.write.mode("overwrite").parquet(
            os.path.join(tmp, "epoch=-1")
        )
        bak = f"{self.path}.bak"
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(self.path, bak)
        os.rename(tmp, self.path)
        shutil.rmtree(bak, ignore_errors=True)

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


from ..scratch import scratch_dir
from ..registry import register  # noqa: E402  (placed after class to avoid cycle at import)


@register(
    "st08_continuous_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY w_start, event_type
    """,
    category="streaming",
    doc=(
        "continuous rollup maintenance: foreachBatch keeps an epoch-"
        "partitioned partial store up to date; the folded rollup must "
        "equal the batch aggregate (idempotent replay + compaction are "
        "exercised in tests/test_rollup.py)."
    ),
)
def st08_continuous_rollup(spark, sf_dir):

    from .ops import _events_stream

    root = scratch_dir(prefix="dlw_rollup_q_")
    m = RollupMaintainer(spark, os.path.join(root, "rollup"))
    n_part = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
    except Exception:  # noqa: BLE001
        prev = None
    spark.conf.set("spark.sql.shuffle.partitions", n_part)
    try:
        q = m.attach(_events_stream(spark, sf_dir), os.path.join(root, "ckpt"))
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        else:
            spark.conf.unset("spark.sql.shuffle.partitions")
    return m.read()
