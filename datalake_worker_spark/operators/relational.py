"""Relational batch operators: scans, filters, joins (all types), and
aggregations (SURVEY.md §2.2 "Relational (batch)").

The reference's only "queries" are key lookups (list / find / delete,
/root/reference/src/bin/main.rs:7-12); the full relational surface here is
the engine-native generalization mandated by the north star. Everything is
declarative DataFrame API — Catalyst handles pushdown, pruning, join
selection (broadcast vs sort-merge), and AQE handles skew/coalescing at
runtime. No collect() of data-scale results anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .common import (
    MONEY,
    RATE,
    SQL_REVENUE,
    davg,
    dec,
    dsum,
    revenue_expr,
    sql_cast_double,
    sql_davg,
    sql_dsum,
)


# --------------------------------------------------------------------------
# Q1-style pricing summary — the M1 flagship slice (SURVEY §7 M1)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_cast_double(f'SUM({SQL_REVENUE})')} AS sum_disc_price,
           {sql_cast_double(f'SUM({SQL_REVENUE} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount', 'DECIMAL(4,2)')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan → filter → groupBy(2) → 8 aggregates.",
)
def q01_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(RATE)
    disc_price = revenue_expr()
    charge = disc_price * (one + dec("l_tax", RATE))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", RATE).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection / filter battery: IN, BETWEEN, LIKE, boolean composition
# --------------------------------------------------------------------------
@register(
    "q02_filter_project",
    """
    SELECT p_partkey, p_brand, p_type, p_size,
           CAST(p_retailprice AS DOUBLE) AS price
    FROM part
    WHERE p_size IN (10, 20, 30, 40)
      AND p_retailprice BETWEEN 905.0 AND 915.0
      AND p_type LIKE '%AN%'
      AND NOT (p_brand = 'Brand#13')
    """,
    doc="select/filter: IN, BETWEEN, LIKE, NOT — all pushed to the parquet scan.",
)
def q02_filter_project(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").isin(10, 20, 30, 40)
            & F.col("p_retailprice").between(905.0, 915.0)
            & F.col("p_type").like("%AN%")
            & ~(F.col("p_brand") == "Brand#13")
        )
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "p_size",
            F.col("p_retailprice").cast("double").alias("price"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join → agg → top-k
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="customer ⋈ orders ⋈ lineitem → agg → deterministic top-10.",
)
def q03_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Semi-join (EXISTS): TPC-H Q4 shape
# --------------------------------------------------------------------------
@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="left-semi join ≡ EXISTS; group count per priority.",
)
def q04_order_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join with region filter
# --------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="6-way join; nation/region are broadcast dims, fact joins shuffle on keys.",
)
def q05_local_supplier_volume(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: pure filter + aggregate (fully pushed-down scan)
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="filter-heavy scan: every predicate reaches the parquet reader.",
)
def q06_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", RATE))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned items, 4-way join, top-20
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="join fact-to-dims, agg, deterministic top-20 (tie-break on key).",
)
def q10_returned_items(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Outer joins
# --------------------------------------------------------------------------
@register(
    "j01_left_outer_counts",
    """
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey
    """,
    doc="left outer join with join-time predicate; customers w/o orders kept.",
)
def j01_left_outer_counts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0)).cast(MONEY))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "j02_full_outer",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000),
         rich   AS (SELECT c_custkey AS k, c_name FROM customer WHERE c_acctbal > 9000)
    SELECT COALESCE(b.k, r.k) AS custkey,
           (b.k IS NOT NULL) AS is_big_buyer,
           (r.k IS NOT NULL) AS is_rich
    FROM buyers b FULL OUTER JOIN rich r ON b.k = r.k
    """,
    doc="full outer join of two derived sets.",
)
def j02_full_outer(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("bk")
    ).distinct()
    rich = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("rk"))
    return buyers.join(rich, buyers.bk == rich.rk, "full_outer").select(
        F.coalesce("bk", "rk").alias("custkey"),
        F.col("bk").isNotNull().alias("is_big_buyer"),
        F.col("rk").isNotNull().alias("is_rich"),
    )


@register(
    "j03_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join ≡ NOT EXISTS: customers with no orders.",
)
def j03_anti_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j04_cross_join",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    doc="explicit cross join (dims only — never fact×fact at scale).",
)
def j04_cross_join(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "j05_theta_join",
    """
    SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_poorer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_suppkey
    """,
    doc="theta join: equi on nation + non-equi on balance (SMJ + filter).",
)
def j05_theta_join(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_poorer_customers"))
    )


@register(
    "j06_broadcast_join",
    """
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY p_brand
    """,
    doc="explicit broadcast hint: dim side ships to every executor, no shuffle of the fact.",
)
def j06_broadcast_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_items"))
    )


@register(
    "j07_null_safe_join",
    """
    WITH l AS (SELECT l_orderkey, NULLIF(l_returnflag, 'N') AS flag FROM lineitem),
         d AS (SELECT * FROM (VALUES ('R', 'returned'), ('A', 'accepted'), (NULL, 'none')) t(flag, label))
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n
    FROM l JOIN d ON l.flag IS NOT DISTINCT FROM d.flag
    GROUP BY label
    """,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match.",
)
def j07_null_safe_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("NULLIF(l_returnflag, 'N')").alias("flag")
    )
    d = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), (None, "none")], "flag string, label string"
    )
    return (
        li.join(F.broadcast(d), li.flag.eqNullSafe(d.flag))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Aggregation battery
# --------------------------------------------------------------------------
@register(
    "a01_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with GROUPING id (subtotal rows disambiguated from real NULLs).",
)
def a01_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")


@register(
    "a02_cube",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all grouping-set combinations.",
)
def a02_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n")
    ).select("l_returnflag", "l_linestatus", "gid", "n")


@register(
    "a03_count_distinct_having",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    HAVING COUNT(*) > 100
    """,
    doc="exact multi count-distinct (expand+two-phase agg) with HAVING.",
)
def a03_count_distinct_having(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") > 100)
    )


@register(
    "a04_minmax_stats",
    """
    SELECT o_orderstatus,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="min/max on doubles and timestamps are exact & order-independent.",
)
def a04_minmax_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "a05_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="pivot on linestatus ≡ conditional aggregation.",
)
def a05_pivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@register(
    "j09_right_outer",
    """
    SELECT c_custkey, o_orderkey
    FROM orders RIGHT JOIN customer
      ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    """,
    doc="right outer join: all customers kept, only urgent orders matched.",
)
def j09_right_outer(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT"),
        "right",
    ).select("c_custkey", "o_orderkey")


@register(
    "j08_composite_key_join",
    """
    WITH first_lines AS (
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber = 1
    )
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(l.l_quantity AS DOUBLE) AS qty,
           CAST(f.l_quantity AS DOUBLE) AS first_line_qty
    FROM lineitem l
    JOIN first_lines f
      ON l.l_orderkey = f.l_orderkey AND l.l_linenumber <> f.l_linenumber
    """,
    doc="composite/multi-condition self-join: later lines vs line 1 of the same order.",
)
def j08_composite_key_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    first = li.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("f_orderkey"),
        F.col("l_linenumber").alias("f_linenumber"),
        F.col("l_quantity").alias("f_quantity"),
    )
    return (
        li.join(
            first,
            (li.l_orderkey == first.f_orderkey)
            & (li.l_linenumber != first.f_linenumber),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("f_quantity").cast("double").alias("first_line_qty"),
        )
    )


@register(
    "q11_scalar_subquery",
    """
    SELECT c_custkey, c_name,
           (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
             AS max_order,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders))
             AS n_above_avg
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    doc="scalar + correlated subqueries (Catalyst rewrites to joins).",
)
def q11_scalar_subquery(spark, sf_dir):
    from ..sources import load_table as _lt

    for t in ("customer", "orders"):
        _lt(spark, sf_dir, t).createOrReplaceTempView(f"_sq_{t}")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM _sq_orders WHERE o_custkey = c_custkey)
                 AS max_order,
               (SELECT COUNT(*) FROM _sq_orders WHERE o_custkey = c_custkey
                  AND o_totalprice > (SELECT AVG(o_totalprice) FROM _sq_orders))
                 AS n_above_avg
        FROM _sq_customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM _sq_customer)
        """
    )


@register(
    "a06_grouping_sets",
    """
    SELECT n_name, c_mktsegment,
           GROUPING(n_name, c_mktsegment) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
    doc="explicit GROUPING SETS via SQL on a joined input.",
)
def a06_grouping_sets(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("_gs_cust_nation")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment,
               grouping_id(n_name, c_mktsegment) AS gid,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM _gs_cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


@register(
    "j10_salted_skew_join",
    """
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w.weight) AS BIGINT) AS total_weight
    FROM events e
    JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 5),
                 ('signup', 3), ('error', 1)) w(event_type, weight)
      ON e.event_type = w.event_type
    GROUP BY e.event_type
    """,
    doc=(
        "explicit salted join on a 5-value hot key: the fact side gets a "
        "positional salt in [0,8), the dim side replicates 8x, and the "
        "join key becomes (key, salt) — one hot key spreads over 8 "
        "reducers. The fallback for skew AQE can't split (hot key on "
        "BOTH sides); results are identical to the plain join, which is "
        "the oracle."
    ),
)
def j10_salted_skew_join(spark, sf_dir):
    from .skew import salted_join

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 5), ("signup", 3), ("error", 1)],
        "event_type string, weight int",
    )
    j = salted_join(e, dim, "event_type", salt_buckets=8)
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("weight").cast("bigint").alias("total_weight"),
    )


_J11_SQL = """
    SELECT 'no_null' AS variant, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM {o} WHERE o_custkey NOT IN
        (SELECT c_custkey FROM {c} WHERE c_custkey % 97 = 0)
    UNION ALL
    SELECT 'with_null' AS variant, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM {o} WHERE o_custkey NOT IN
        (SELECT c_custkey FROM {c} WHERE c_custkey % 97 = 0
         UNION ALL SELECT CAST(NULL AS BIGINT))
"""


@register(
    "j11_not_in_null_aware",
    _J11_SQL.format(o="orders", c="customer"),
    doc=(
        "null-aware anti join (NOT IN subquery), the classic three-"
        "valued-logic trap: with no NULL in the subquery it is a plain "
        "anti join; ONE NULL makes every NOT IN predicate UNKNOWN and "
        "the result collapses to zero rows — both variants counted side "
        "by side. Spark plans the null-aware case as a broadcast "
        "null-aware anti join (the build side must broadcast — there is "
        "no shuffled NAAJ), which is why production pipelines rewrite "
        "NOT IN to NOT EXISTS (j03's shape) when the subquery might be "
        "big or nullable. Cited here through the SQL surface to pin "
        "semantic parity with ANSI engines."
    ),
)
def j11_not_in_null_aware(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_j11_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_j11_customer")
    return spark.sql(_J11_SQL.format(o="_j11_orders", c="_j11_customer"))
