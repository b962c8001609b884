"""Approximate-aggregate tolerance tests (BASELINE.md: approx ops are
recall/tolerance-tested, never hash-matched)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.sources import load_table

_load_all()


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_parts
        for r in REGISTRY["a08_approx_aggregates"].spark_fn(spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, approx[k], n)


def test_percentile_approx_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.m
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_median_price
        for r in REGISTRY["a08_approx_aggregates"].spark_fn(spark, sf_dir).collect()
    }
    for k, m in exact.items():
        assert abs(approx[k] - m) / m < 0.05, (k, approx[k], m)
