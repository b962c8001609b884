"""Custom stateful operator: multi-batch state accumulation
(applyInPandasWithState), and bucketed-join shuffle elimination."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.streaming.stateful import running_user_totals


def test_state_accumulates_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    schema = "user_id long, value double, ts timestamp"
    from datetime import datetime

    b1 = [(1, 10.0, datetime(2024, 1, 1)), (2, 5.0, datetime(2024, 1, 1))]
    b2 = [(1, 7.0, datetime(2024, 1, 2))]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(d / "f2"))

    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        running_user_totals(s)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("state_sink").collect()
    # user 1 appears in both batches: cumulative n goes 1 → 2
    u1 = sorted((r.n_events, r.total_value) for r in rows if r.user_id == 1)
    assert u1[-1] == (2, 17.0), rows
    u2 = [(r.n_events, r.total_value) for r in rows if r.user_id == 2]
    assert (1, 5.0) in u2


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-located tables join without an Exchange — the 100 TB
    pattern for repeated joins on the same key."""
    from datalake_worker_spark.plans.inspect import simple_plan
    from datalake_worker_spark.sources import load_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        o.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        c.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    # disable broadcast so the join would normally shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = simple_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucketing removed both shuffles
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
