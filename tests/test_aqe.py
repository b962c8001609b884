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
