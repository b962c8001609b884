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


# ---------------------------------------------------------------------------
# r10 verdict item 4: kill-mid-epoch crash recovery for the state family
# ---------------------------------------------------------------------------
#
# The crash model: the epoch-k STATE write happened (fully or torn)
# but the stream checkpoint's commit marker for batch k was never
# written — exactly what a kill between state flush and commit leaves
# behind. Simulated by deleting <ckpt>/commits/2 after a 3-batch run
# (so batch 2 replays on restart) plus op-specific state damage:
# a torn EpochStore generation (st13/st14), a missing sketch snapshot
# (st20), and the RocksDB provider's own uncommitted trailing version
# (st21). The restarted run must converge to the uninterrupted run's
# exact rows — at-least-once replay over idempotent epoch state.

import json
import shutil


def _delete_commit(root, batch_id=2):
    d = os.path.join(root, "_ckpt", "commits")
    p = os.path.join(d, str(batch_id))
    assert os.path.exists(p), f"expected commit marker {p}"
    os.remove(p)
    # the local ChecksumFs keeps a sidecar .crc; a leftover one makes
    # the restart's atomic rename of the rewritten marker fail
    crc = os.path.join(d, f".{batch_id}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def _tear_generation(gen_dir):
    """Remove one data file from an epoch generation dir (torn write);
    if only one file exists, truncate the dir to empty instead."""
    assert os.path.isdir(gen_dir), gen_dir
    parts = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(gen_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    assert parts, f"no parquet files under {gen_dir}"
    os.remove(parts[0])


def _doc_batches(spark, sf_dir, n=4):
    from datalake_worker_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return [d.filter(F.col("doc_id") % n == i) for i in range(n)]


def _st13_run(spark, sf_dir, root):
    from datalake_worker_spark.streaming.incdedup import (
        run_incremental_near_dup,
    )

    def run(batches):
        return sorted(
            map(
                tuple,
                run_incremental_near_dup(
                    spark, batches, root=root, compact_every=0
                ).collect(),
            )
        )

    return run, _doc_batches(spark, sf_dir)


def _st13_damage(root):
    _tear_generation(os.path.join(root, "state_sigs", "gen=e2"))
    shutil.rmtree(os.path.join(root, "state_bands", "gen=e2"))


def _st14_run(spark, sf_dir, root):
    from datalake_worker_spark.sources import load_table
    from datalake_worker_spark.functions.similarity import to_double_array
    from datalake_worker_spark.streaming.vecindex import (
        run_streaming_vector_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    batches = [e.filter(F.col("vec_id") % 4 == i) for i in range(4)]
    queries = e.filter(F.col("vec_id") < 8)

    def run(bs):
        return sorted(
            map(
                tuple,
                run_streaming_vector_index(
                    spark, bs, queries, root=root, compact_every=0
                ).collect(),
            )
        )

    return run, batches


def _st14_damage(root):
    _tear_generation(os.path.join(root, "index", "gen=e2"))


def _st20_run(spark, sf_dir, root):
    from datalake_worker_spark.streaming.spacesaving import (
        run_spacesaving_topk,
    )

    def run(batches):
        top, floor, _ = run_spacesaving_topk(spark, batches, root=root)
        return (sorted(top.items()), floor)

    return run, _doc_batches(spark, sf_dir)


def _st20_damage(root):
    os.remove(os.path.join(root, "state_000002.json"))


def _st21_run(spark, sf_dir, root):
    from datalake_worker_spark.sources import load_table
    from datalake_worker_spark.streaming.incdedup import stage_batches
    from datalake_worker_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    batches = [ev.filter(F.col("user_id") % 4 == i) for i in range(4)]
    out_dir = os.path.join(root, "out")

    def run(bs):
        landing = stage_batches(
            root, bs, [F.col("user_id"), F.col("value")]
        )
        schema = spark.read.parquet(landing).schema
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

        def sink(df, eid):
            df.write.mode("append").parquet(out_dir)

        q = (
            running_user_totals(s)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option(
                "checkpointLocation", os.path.join(root, "_ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(out_dir)
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return sorted(
            map(
                tuple,
                out.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .collect(),
            )
        )

    return run, batches


def _st21_damage(root):
    pass  # the provider's own uncommitted trailing state version IS the tear


_CRASH_OPS = {
    "st13_incremental_near_dup": (_st13_run, _st13_damage),
    "st14_streaming_vector_index": (_st14_run, _st14_damage),
    "st20_spacesaving_topk": (_st20_run, _st20_damage),
    "st21_rocksdb_stateful_totals": (_st21_run, _st21_damage),
}


def _fold_stores(name, root):
    """Production-layout EpochStore handles for the fold-race test."""
    from datalake_worker_spark.streaming.incdedup import EpochStore

    if name == "st13_incremental_near_dup":
        return [
            EpochStore(
                os.path.join(root, "state_bands"), ["band_idx", "band_hash"]
            ),
            EpochStore(os.path.join(root, "state_sigs"), ["doc_id"]),
        ]
    return [
        EpochStore(
            os.path.join(root, "index"),
            sort_cols=["vec_id"],
            buckets=2,
            partition_by=["cid"],
        )
    ]


@pytest.mark.parametrize(
    "name", ["st13_incremental_near_dup", "st14_streaming_vector_index"]
)
def test_kill_mid_epoch_recovery_with_racing_fold(spark, sf_dir, tmp_path, name):
    """r11 verdict item 9: a maintenance generation fold landing
    BETWEEN the crash and the restart — the interleaving the plain
    kill-mid-epoch test doesn't cover. The fold compacts the committed
    epochs 0,1 into one c1 generation while epoch 2 sits torn and
    uncommitted; compact()'s contract never folds the in-flight epoch,
    so the restarted replay must stay a pure gen=e2 overwrite on top of
    the folded history and produce EXACTLY the uninterrupted run's
    rows."""
    make, damage = _CRASH_OPS[name]
    with rocksdb_state_store(spark):
        run_a, batches = make(spark, sf_dir, str(tmp_path / "a"))
        want = run_a(batches)
        run_b, batches_b = make(spark, sf_dir, str(tmp_path / "b"))
        run_b(batches_b[:3])
        _delete_commit(str(tmp_path / "b"))
        damage(str(tmp_path / "b"))
        for store in _fold_stores(name, str(tmp_path / "b")):
            store.compact(spark, before_epoch=2)
        got = run_b(batches_b)
    assert got == want and len(got) > 0


@pytest.mark.parametrize("name", sorted(_CRASH_OPS))
def test_kill_mid_epoch_recovery(spark, sf_dir, tmp_path, name):
    """State equivalence across a kill-mid-epoch restart, RocksDB
    provider engaged (r10 verdict item 4): batch 2's state is written
    (then torn) but its commit marker is lost; the restarted stream
    replays batch 2 over the surviving state and must produce EXACTLY
    the uninterrupted run's rows."""
    make, damage = _CRASH_OPS[name]
    with rocksdb_state_store(spark):
        # uninterrupted reference
        run_a, batches = make(spark, sf_dir, str(tmp_path / "a"))
        want = run_a(batches)
        # crashed run: 3 batches commit 0,1; batch 2's commit is lost
        run_b, batches_b = make(spark, sf_dir, str(tmp_path / "b"))
        run_b(batches_b[:3])
        _delete_commit(str(tmp_path / "b"))
        damage(str(tmp_path / "b"))
        got = run_b(batches_b)
    assert got == want and len(got) > 0
