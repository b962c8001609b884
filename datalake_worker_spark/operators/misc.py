"""Unpivot and approximate aggregates (SURVEY.md §2.2).

Approximate ops are excluded from the hash-match oracle by design
(BASELINE.md) — they get rows-only driver checks plus tolerance tests
against their exact counterparts in the pytest suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "a07_unpivot",
    """
    SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    )
    """,
    doc="unpivot (wide→long): one row per (key, metric, value).",
)
def a07_unpivot(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return o.unpivot(
        ["o_orderkey"], ["totalprice", "custkey"], "metric", "value"
    )


@register(
    "a08_approx_aggregates",
    None,  # approximate by construction — tolerance-tested in pytest
    doc="approx_count_distinct (HLL++) and percentile_approx per return flag.",
)
def a08_approx_aggregates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # scalar columns only: an ARRAY column crashes the driver's pandas-based
    # canonicalizer (round-1 "unhashable type: 'list'") — quartiles ship as
    # two scalars instead of one array.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.25).alias("approx_p25"),
        F.percentile_approx("l_extendedprice", 0.75).alias("approx_p75"),
    )
