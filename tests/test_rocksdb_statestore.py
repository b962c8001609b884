"""RocksDB state store provider (VERDICT r9 item 1 / SURVEY §7 M4):
the production state backend — Spark's analogue of the reference's
RocksDB storage engine (src/rocksdb_storage_engine.rs:16-19) — must be
EXERCISED, not just name-dropped.

Three layers of proof:
  1. engagement: a stateful stream started under the provider reports
     RocksDB-specific custom metrics and writes SST files into its
     checkpoint (the conf wasn't silently ignored);
  2. equivalence: every Spark-state-store-backed operator class —
     watermarked dropDuplicates (st04), applyInPandasWithState (st06),
     dropDuplicatesWithinWatermark (st12), tumbling/session windowed
     aggregation (st01/st03), symmetric and outer stream-stream join
     state (st07/st09), rank-over-state trending (st16), and the
     late-drop eviction discipline (st17) — returns IDENTICAL results
     under RocksDB and the default heap-backed provider (the
     foreachBatch family st13/st14/st18/st20 keeps its own epoch-keyed
     state and never touches the provider);
  3. hygiene: the scoped opt-in restores the session conf on exit, so
     unrelated queries keep the default provider.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.streaming.statestore import (
    ROCKSDB_PROVIDER,
    STATE_STORE_CONF,
    rocksdb_metrics,
    rocksdb_state_store,
)

_load_all()


def _conf(spark):
    try:
        return spark.conf.get(STATE_STORE_CONF)
    except Exception:  # noqa: BLE001
        return None


def test_rocksdb_provider_engaged(spark, tmp_path):
    """A windowed count under the provider must surface rocksdb*
    progress metrics and land SST files in the checkpoint — direct
    evidence the native store ran (rocksdbjni ships in pyspark's own
    jars, so this needs no classpath gate)."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    spark.range(200).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.parquet(src)
    with rocksdb_state_store(spark):
        s = spark.readStream.schema("id long, k long").parquet(src)
        q = (
            s.groupBy("k")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocks_probe")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        metrics = rocksdb_metrics(q.lastProgress)
    assert metrics, "no rocksdb custom metrics — provider did not engage"
    assert any("rocksdbCommit" in k for k in metrics)
    ssts = [
        f
        for root, _, fs in os.walk(os.path.join(ckpt, "state"))
        for f in fs
        if f.endswith(".sst") or f.endswith(".zip")
    ]
    assert ssts, "no RocksDB SST/snapshot files under the checkpoint"
    assert spark.table("rocks_probe").count() == 7


@pytest.mark.parametrize(
    "name",
    [
        "st04_stream_dedup",  # watermarked dropDuplicates state
        "st06_stateful_user_totals",  # applyInPandasWithState state
        "st12_dedup_within_watermark",  # watermark-evicted dedup state
        # r10 widening: every Spark-state-store-backed op class (the
        # foreachBatch family st13/st14/st18/st20 keeps its own
        # epoch-keyed state and never touches the provider)
        "st01_tumbling_window",  # windowed-agg state
        "st03_session_window",  # session-window state
        "st07_stream_stream_join",  # symmetric join state
        "st09_stream_stream_left_join",  # outer-join state + watermark
        "st16_trending_topk",  # windowed agg + rank over state output
        "st17_watermark_late_drop",  # late-drop eviction discipline
    ],
)
def test_provider_equivalence(spark, sf_dir, name):
    """Same query, both providers, identical rows — the state store is
    a storage backend, never a semantics change."""
    fn = REGISTRY[name].spark_fn
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    with rocksdb_state_store(spark):
        rocks = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert base == rocks
    assert len(base) > 0


def test_scoped_conf_restored(spark):
    before = _conf(spark)
    with rocksdb_state_store(spark):
        assert spark.conf.get(STATE_STORE_CONF) == ROCKSDB_PROVIDER
    assert _conf(spark) == before


def test_st21_registry_query_matches_st06(spark, sf_dir):
    """The driver-facing RocksDB query: identical rows to st06 (same
    operator, different state backend) — the pure-storage-swap
    contract, driver-verifiable via the shared batch oracle."""
    a = sorted(
        map(tuple, REGISTRY["st06_stateful_user_totals"].spark_fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, REGISTRY["st21_rocksdb_stateful_totals"].spark_fn(spark, sf_dir).collect())
    )
    assert a == b and len(b) > 0
    assert _conf(spark) != ROCKSDB_PROVIDER  # scope restored
