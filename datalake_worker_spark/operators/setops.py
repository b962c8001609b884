"""Set operators: union all / union distinct / intersect / except
(SURVEY.md §2.2 "set ops")."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "u01_union_all",
    """
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    doc="UNION ALL preserves duplicates (verified via counts).",
)
def u01_union_all(spark, sf_dir):
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "u02_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct) deduplicates across inputs.",
)
def u02_union_distinct(spark, sf_dir):
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "u03_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    """,
    doc="INTERSECT (distinct) of two derived key sets.",
)
def u03_intersect(spark, sf_dir):
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("k"))
    )
    return a.intersect(b)


@register(
    "u04_except_all",
    """
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT o_custkey AS k FROM orders
        EXCEPT ALL
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ) GROUP BY k
    """,
    doc="EXCEPT ALL: bag difference (multiplicity-aware).",
)
def u04_except_all(spark, sf_dir):
    a = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    return a.exceptAll(b).groupBy("k").agg(F.count("*").alias("n"))


@register(
    "u06_intersect_all",
    """
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
    doc="INTERSECT ALL: bag intersection (min multiplicity per value).",
)
def u06_intersect_all(spark, sf_dir):
    a = _cust_nations(spark, sf_dir).withColumnRenamed("nationkey", "k")
    b = _supp_nations(spark, sf_dir).withColumnRenamed("nationkey", "k")
    return a.intersectAll(b).groupBy("k").agg(F.count("*").alias("n"))


@register(
    "u05_except_distinct",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    doc="EXCEPT (distinct): customers that never ordered.",
)
def u05_except_distinct(spark, sf_dir):
    a = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)
