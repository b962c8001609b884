"""Salted-join equivalence + connector stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.operators.skew import salted_join
from datalake_worker_spark.sources.connectors import read_delta, read_iceberg


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"), "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_brand"
    )
    plain = (
        li.join(p, "k")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    salted = (
        salted_join(li, p, "k", salt_buckets=4)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_skewed_key(spark):
    """One hot key (90% of rows) — salted result still exact."""
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(10000)], "k int, v long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k int, tag string")
    out = salted_join(big, dim, "k").groupBy("tag").agg(F.count("*").alias("n"))
    got = {r.tag: r.n for r in out.collect()}
    assert got == {"hot": 9000, "cold": 1000}


def test_connector_stubs_raise_cleanly(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="Delta"):
        read_delta(spark, str(tmp_path))
    with pytest.raises(NotImplementedError, match="Iceberg"):
        read_iceberg(spark, "t")
