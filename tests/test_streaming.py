"""Streaming tests (SURVEY.md §5.4): foreachBatch ingest into the chunk
catalog (the reference's R1/R2 path), watermark late-data semantics, and
batch/stream agreement (the oracle suite covers the window ops)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.catalog import ChunkCatalog
from datalake_worker_spark.streaming.ingest import ingest_stream
from datalake_worker_spark.streaming.ops import run_to_memory


def test_foreachbatch_ingest_registers_chunks(spark, tmp_path):
    """Landing files stream → chunked parquet + catalog rows (R1/R2)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    df1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(0, 150)], "block long, payload string"
    )
    df1.coalesce(1).write.mode("append").parquet(str(landing))

    cat = ChunkCatalog(spark, str(tmp_path / "cat"))
    q = ingest_stream(
        spark,
        cat,
        str(landing),
        df1.schema,
        dataset_id="ds1",
        block_col="block",
        blocks_per_chunk=100,
    )
    q.awaitTermination(60)
    # blocks 0..149 → chunks [0,100) and [100,200)
    chunks = cat.list_chunks()
    assert len(chunks) == 2
    meta0 = cat.find_chunk_meta("ds1", 50)
    meta1 = cat.find_chunk_meta("ds1", 149)
    assert meta0 is not None and meta1 is not None and meta0.chunk_id != meta1.chunk_id
    # data is readable through the pin path and row-complete
    df = cat.read_chunk("ds1", 0)
    assert df.count() == 100
    assert cat.total_size() > 0

    # second drop: new blocks extend the dataset (new epoch → new chunks)
    df2 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200, 260)], "block long, payload string"
    )
    df2.coalesce(1).write.mode("append").parquet(str(landing))
    q2 = ingest_stream(
        spark, cat, str(landing), df1.schema, "ds1", "block", blocks_per_chunk=100
    )
    q2.awaitTermination(60)
    assert cat.find_chunk_meta("ds1", 250) is not None


def test_ingest_rollback_on_cap(spark, tmp_path):
    """Cap overflow mid-ingest: no metadata row, no orphaned data files
    (the reference's cache-rollback ordering, data_manager.rs:263-274)."""
    import pytest as _pytest

    landing = tmp_path / "landing"
    landing.mkdir()
    df = spark.createDataFrame(
        [(i, "x" * 100) for i in range(50)], "block long, payload string"
    )
    df.coalesce(1).write.mode("append").parquet(str(landing))
    cat = ChunkCatalog(spark, str(tmp_path / "cat"), max_size_bytes=10)  # tiny cap
    q = ingest_stream(
        spark, cat, str(landing), df.schema, "ds", "block", blocks_per_chunk=100
    )
    with _pytest.raises(Exception):  # StreamingQueryException wrapping MaxSizeAllocated
        q.awaitTermination(60)
    assert cat.list_chunks() == []  # nothing registered
    data_dir = os.path.join(cat.root, "data", "ds")
    orphans = []
    for root, _, files in os.walk(data_dir):
        orphans.extend(files)
    assert orphans == [], orphans  # files rolled back


def test_watermark_drops_late_events(spark, tmp_path):
    """Events older than the watermark are dropped from the aggregation.

    Two runs share a checkpoint: run 1 advances the watermark to
    01:50 (02:00 max event − 10 min delay); run 2 delivers an event at
    00:00 — below the watermark, so its window never reflects it.
    """
    d = tmp_path / "stream"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = datetime(2024, 1, 1, 0, 0, 0)
    schema = "id long, ts timestamp, value double"

    out_dir = str(tmp_path / "out")

    def run_once():
        # memory sink can't recover from a checkpoint — use a file sink
        # glob: each write lands as a subdirectory; the file source does
        # not recurse without it
        s = spark.readStream.schema(schema).parquet(str(d) + "/*")
        agg = (
            s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("value").alias("v"))
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # run 1 emits nothing (windows close only when a LATER batch's
        # watermark passes them) → the sink dir may hold no data files yet
        out_schema = (
            "w struct<start: timestamp, end: timestamp>, v double"
        )
        return {
            r["w"].start.hour: r["v"]
            for r in spark.read.schema(out_schema).parquet(out_dir).collect()
        }

    # run 1: on-time event at 02:00; end-of-batch watermark becomes 01:50
    spark.createDataFrame(
        [(1, base + timedelta(hours=2), 5.0)], schema
    ).coalesce(1).write.parquet(str(d / "f1"))
    run_once()

    # run 2: a very late event (00:00 < 01:50 watermark → dropped) plus an
    # on-time event at 03:30 that pushes the watermark past hour 2
    spark.createDataFrame(
        [(2, base, 99.0), (3, base + timedelta(hours=3, minutes=30), 7.0)], schema
    ).coalesce(1).write.parquet(str(d / "f2"))
    run_once()

    # run 3: closed windows emit in the batch AFTER the watermark passes
    # them — one more event flushes [02:00, 03:00)
    spark.createDataFrame(
        [(4, base + timedelta(hours=5), 1.0)], schema
    ).coalesce(1).write.parquet(str(d / "f3"))
    rows = run_once()

    # hour-0 window never appears: its only event was late-dropped
    assert 0 not in rows, rows
    # on-time windows closed and emitted exactly the on-time sums
    assert rows.get(2) == 5.0, rows
    assert rows.get(3) == 7.0, rows


def test_stream_batch_agreement_tumbling(spark, sf_dir):
    """Same tumbling agg as stream and as batch must agree (unified
    semantics — this is why DuckDB is a legitimate streaming oracle)."""
    from datalake_worker_spark.registry import REGISTRY, _load_all
    from datalake_worker_spark.sources import load_table

    _load_all()
    stream_out = REGISTRY["st01_tumbling_window"].spark_fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )
    assert sorted(map(tuple, stream_out.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_incremental_near_dup_planted(spark, tmp_path):
    """Dedup-against-history: batch 0 admits A and B (distinct) and drops
    A's exact copy; batch 1 must drop a near-duplicate of A (one word
    changed) via the signature state and admit only the novel doc C."""
    from datalake_worker_spark.streaming.incdedup import run_incremental_near_dup

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    near = base.replace("alpha3", "ALPHA3", 1)  # one token differs
    other = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(12))
    novel = " ".join(f"omega{i} sigma{i} kappa{i}" for i in range(12))
    b0 = spark.createDataFrame(
        [(1, base), (2, other), (3, base)], ["doc_id", "text"]
    )  # 3 = exact copy of 1
    b1 = spark.createDataFrame([(10, near), (11, novel)], ["doc_id", "text"])
    out = run_incremental_near_dup(spark, [b0, b1], root=str(tmp_path / "inc"))
    got = {(r.doc_id, r.epoch) for r in out.collect()}
    assert got == {(1, 0), (2, 0), (11, 1)}, got


def test_streaming_vector_index_recall_and_pruning(spark, tmp_path):
    """Frozen-quantizer streaming index on clusterable blobs: the second
    batch is indexed without retraining, search recall vs exact stays
    high, and the probe's cell filter prunes index partition
    directories (PartitionFilters — the index layout IS the plan)."""
    import random

    from datalake_worker_spark.functions.similarity import exact_topk
    from datalake_worker_spark.plans.inspect import formatted_plan
    from datalake_worker_spark.streaming.vecindex import run_streaming_vector_index

    rng = random.Random(13)
    centers = [[rng.gauss(0, 5) for _ in range(16)] for _ in range(6)]
    rows = [
        (i, [c + rng.gauss(0, 0.5) for c in centers[i % 6]]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    b0 = df.filter(F.col("vec_id") < 150)
    b1 = df.filter(F.col("vec_id") >= 150)
    probes = df.filter(F.col("vec_id") < 12)
    out = run_streaming_vector_index(
        spark, [b0, b1], probes, k=5, n_clusters=6, nprobe=2, dim=16, iters=2,
        root=str(tmp_path / "idx"),
    )
    plan = formatted_plan(out)
    assert "PartitionFilters: [" in plan
    assert "PartitionFilters: []" not in plan, plan
    got = out.collect()
    # neighbors from BOTH batches must be reachable
    assert any(r.neighbor_id >= 150 for r in got)
    exact = exact_topk(df, probes, "vec_id", "v", k=5).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in got}
    assert len(e & a) / len(e) >= 0.85, len(e & a) / len(e)


def test_incremental_near_dup_replay_idempotent(spark, tmp_path):
    """Full at-least-once replay (checkpoint lost, state retained): the
    history join reads STRICTLY EARLIER epochs, so re-processing a batch
    against its own first attempt's state must not self-match and erase
    admitted docs."""
    import shutil

    from datalake_worker_spark.streaming.incdedup import run_incremental_near_dup

    a = " ".join(f"alpha{i} beta{i}" for i in range(15))
    b = " ".join(f"omega{i} kappa{i}" for i in range(15))
    b0 = spark.createDataFrame([(1, a)], ["doc_id", "text"])
    b1 = spark.createDataFrame([(2, b)], ["doc_id", "text"])
    root = str(tmp_path / "inc")
    first = {(r.doc_id, r.epoch) for r in
             run_incremental_near_dup(spark, [b0, b1], root=root).collect()}
    assert first == {(1, 0), (2, 1)}
    shutil.rmtree(os.path.join(root, "_ckpt"))  # lose the checkpoint
    replay = {(r.doc_id, r.epoch) for r in
              run_incremental_near_dup(spark, [b0, b1], root=root).collect()}
    assert replay == first, replay


def test_vector_index_quantizer_survives_restart(spark, tmp_path):
    """The frozen coarse quantizer is durable model state: a restarted
    run that replays only the SECOND batch must assign with the same
    centroids the first epoch was indexed under."""
    import json
    import random
    import shutil

    from datalake_worker_spark.streaming.vecindex import run_streaming_vector_index

    rng = random.Random(17)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    b0 = df.filter(F.col("vec_id") < 60)
    b1 = df.filter(F.col("vec_id") >= 60)
    probes = df.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "idx")
    first = sorted(map(tuple, run_streaming_vector_index(
        spark, [b0, b1], probes, k=3, n_clusters=4, nprobe=2, dim=16, root=root
    ).collect()))
    model_path = os.path.join(root, "model.json")
    with open(model_path) as fh:
        cents_before = json.load(fh)
    mtime_before = os.path.getmtime(model_path)
    time.sleep(0.05)
    # restart: checkpoint lost, batches replay against the existing root.
    # The run must LOAD the persisted quantizer, never retrain — a
    # retrain rewrites model.json (fresh mtime) and, on a partial
    # replay, would re-assign later epochs under different centroids.
    shutil.rmtree(os.path.join(root, "_ckpt"))
    second = sorted(map(tuple, run_streaming_vector_index(
        spark, [b0, b1], probes, k=3, n_clusters=4, nprobe=2, dim=16, root=root
    ).collect()))
    with open(model_path) as fh:
        cents_after = json.load(fh)
    assert cents_after == cents_before
    assert os.path.getmtime(model_path) == mtime_before, "quantizer was retrained"
    assert second == first


def test_incremental_near_dup_overcap_fallback(spark, tmp_path):
    """A hot LSH bucket overflowing bucket_cap must NOT silently admit
    the over-cap docs: each one is verified against the bucket's min id
    (the cluster representative) and the fallback count is surfaced in
    the per-epoch stats (no silent coverage caps)."""
    from datalake_worker_spark.streaming.incdedup import (
        read_stats,
        run_incremental_near_dup,
    )

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    cluster = [(i, base + f" tail{i}") for i in range(1, 11)]  # 10 near-dups
    novel = (99, " ".join(f"omega{i} sigma{i}" for i in range(12)))
    b0 = spark.createDataFrame(cluster + [novel], ["doc_id", "text"])
    root = str(tmp_path / "inc")
    out = run_incremental_near_dup(spark, [b0], root=root, bucket_cap=4)
    got = {r.doc_id for r in out.collect()}
    assert got == {1, 99}, got  # docs 5..10 dropped via the representative path
    stats = read_stats(spark, root).collect()
    assert len(stats) == 1
    assert stats[0].n_overcap_docs >= 6, stats  # ids 5..10 beyond the cap
    assert stats[0].n_admitted == 2


def test_incremental_near_dup_state_compaction(spark, tmp_path):
    """Generation compaction folds epoch dirs without changing results:
    a compacted run admits the same (doc_id, epoch) set as an
    uncompacted one, state gen-dir count stays bounded, and a
    checkpoint-lost replay on the compacted state is still idempotent."""
    import shutil

    from datalake_worker_spark.streaming.incdedup import run_incremental_near_dup

    def doc(i):
        return " ".join(f"w{i}x{j} y{i}z{j}" for j in range(12))

    batches = [
        spark.createDataFrame(
            [(10 * e + i, doc(10 * e + i)) for i in range(2)], ["doc_id", "text"]
        )
        for e in range(5)
    ]
    root_a = str(tmp_path / "plain")
    plain = {(r.doc_id, r.epoch) for r in
             run_incremental_near_dup(spark, batches, root=root_a,
                                      compact_every=0).collect()}
    root_b = str(tmp_path / "compacted")
    compacted = {(r.doc_id, r.epoch) for r in
                 run_incremental_near_dup(spark, batches, root=root_b,
                                          compact_every=2).collect()}
    assert compacted == plain
    gens = sorted(os.listdir(os.path.join(root_b, "state_sigs")))
    assert gens == ["gen=c3", "gen=e4"], gens  # e0..e3 folded, not the live epoch
    # replay with lost checkpoint: folded history must not self-match or
    # double-count, and rewritten epoch dirs stay excluded by the cover
    shutil.rmtree(os.path.join(root_b, "_ckpt"))
    replay = {(r.doc_id, r.epoch) for r in
              run_incremental_near_dup(spark, batches, root=root_b,
                                       compact_every=2).collect()}
    assert replay == plain, replay


def test_vector_index_compaction_identical_results(spark, tmp_path):
    """Index generation compaction: folding epoch generations must not
    change probe results, must keep the cid= sub-partition layout (the
    directory-pruning contract), and must bound the gen-dir count."""
    import random

    from datalake_worker_spark.streaming.vecindex import run_streaming_vector_index

    rng = random.Random(23)
    centers = [[rng.gauss(0, 5) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [c + rng.gauss(0, 0.4) for c in centers[i % 4]]) for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    batches = [df.filter((F.col("vec_id") % 6) == m) for m in range(6)]
    probes = df.filter(F.col("vec_id") < 8)
    kw = dict(k=3, n_clusters=4, nprobe=2, dim=8, iters=1)
    plain = sorted(map(tuple, run_streaming_vector_index(
        spark, batches, probes, root=str(tmp_path / "plain"),
        compact_every=0, **kw).collect()))
    root_c = str(tmp_path / "compacted")
    compacted = sorted(map(tuple, run_streaming_vector_index(
        spark, batches, probes, root=root_c, compact_every=2, **kw).collect()))
    assert compacted == plain
    gens = sorted(os.listdir(os.path.join(root_c, "index")))
    assert gens == ["gen=c3", "gen=e4", "gen=e5"], gens
    assert any(
        d.startswith("cid=")
        for d in os.listdir(os.path.join(root_c, "index", "gen=c3"))
    )


def test_st22_asof_stream_equals_batch(spark, sf_dir):
    """The stream-stream as-of join must equal the batch as-of over the
    finalized region (unified semantics), pick the LATEST qualifying
    click per purchase, and emit each purchase at most once."""
    import datetime

    from pyspark.sql import Window as W

    from datalake_worker_spark.registry import REGISTRY, _load_all
    from datalake_worker_spark.sources import load_table

    _load_all()
    got = REGISTRY["st22_stream_stream_asof_join"].spark_fn(spark, sf_dir)
    rows = got.collect()
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))  # at most one winner per purchase

    e = load_table(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).first()[0]
    bound = max_ts - datetime.timedelta(hours=3)
    p = e.filter(
        (F.col("event_type") == "purchase") & (F.col("ts") <= F.lit(bound))
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    batch = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", F.col("click_id").alias("asof_click_id"))
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch.collect()))


def test_st22_state_is_watermark_bounded(spark, sf_dir):
    """Structural: both stream inputs carry event-time watermarks, so
    the interval-join and aggregation state stores are bounded (1 h of
    clicks + open windows), never append-only."""
    from datalake_worker_spark.streaming.ops import _events_stream

    p = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2, plan
