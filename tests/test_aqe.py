"""AQE runtime behaviors: partition coalescing and broadcast conversion
actually engage (the runtime half of the scale story)."""

from __future__ import annotations

from datalake_worker_spark.plans.inspect import final_plan
from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    df = REGISTRY["q01_pricing_summary"].spark_fn(spark, sf_dir)
    plan = final_plan(df)
    # AQE marks the executed plan; coalesced reads appear for small shuffles
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan, plan
    assert "AQEShuffleRead" in plan or "coalesced" in plan, plan


def test_aqe_runtime_broadcast_conversion(spark, sf_dir):
    """A join we did NOT hint still ends up broadcast at runtime when the
    built side turns out small (q03: filtered customer side)."""
    df = REGISTRY["q03_shipping_priority"].spark_fn(spark, sf_dir)
    plan = final_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Spark's runtime bloom-filter injection (SPARK-32268): a selective
    filter on the orders side plants a bloom_filter_might_contain probe
    on the lineitem scan side, pruning shuffle input before the join.
    At 100 TB this is the semi-join reduction that saves the fact-side
    shuffle; thresholds here are forced so the optimizer fires at test
    scale (the data-size gates it normally applies are cluster dials)."""
    from pyspark.sql import functions as F

    from datalake_worker_spark.sources import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan
        # and it still computes the right thing
        assert j.count() >= 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
