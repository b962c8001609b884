"""Continuous rollup maintenance: multi-batch streamed rollup must equal
the batch aggregate over the same data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake_worker_spark.streaming.rollup import RollupMaintainer, _aggregate


def test_rollup_matches_batch(spark, sf_dir, tmp_path):
    import shutil

    src = os.path.join(sf_dir, "events.parquet")
    land = tmp_path / "land"
    land.mkdir()
    # split events into 2 halves → 2 micro-batches
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(land / "a")
    )
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(land / "b")
    )

    raw = spark.read.parquet(str(land / "a")).schema
    from datalake_worker_spark.streaming.ops import _stream_parquet

    stream = _stream_parquet(
        spark, str(land) + "/*", raw, maxFilesPerTrigger=1
    )
    rm = RollupMaintainer(spark, str(tmp_path / "rollup"))
    q = rm.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = sorted(map(tuple, rm.read().collect()))
    want = sorted(map(tuple, _aggregate(e).collect()))
    assert got == want

    # at-least-once replay: re-running an epoch's update must not
    # double-count (idempotent epoch partition overwrite)
    half = e.filter(F.col("event_id") % 2 == 0)
    rm.update(half, 0)
    rm.update(half, 0)
    assert sorted(map(tuple, rm.read().collect())) == want

    # compaction folds partials without changing totals
    rm.compact()
    assert sorted(map(tuple, rm.read().collect())) == want
