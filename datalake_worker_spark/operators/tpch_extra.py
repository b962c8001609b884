"""Additional TPC-H-shaped queries (SURVEY.md §2.2 breadth): min-per-group
join-back, distinct-count rollups, HAVING on sums, anti-join with scalar
subquery, deterministic collect_set aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .common import dsum, sql_davg


@register(
    "q02_min_cost_supplier",
    """
    WITH nation_bal AS (
        SELECT s_nationkey, MIN(s_acctbal) AS min_bal
        FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_nationkey, CAST(s.s_acctbal AS DOUBLE) AS bal
    FROM supplier s JOIN nation_bal nb
      ON s.s_nationkey = nb.s_nationkey AND s.s_acctbal = nb.min_bal
    """,
    doc="TPC-H Q2 shape: per-group minimum + join-back to recover the row.",
)
def q02_min_cost_supplier(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    nb = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(
            nb,
            (s.s_nationkey == nb.nk) & (s.s_acctbal == nb.min_bal),
        )
        .select(
            "s_suppkey",
            "s_name",
            "s_nationkey",
            F.col("s_acctbal").cast("double").alias("bal"),
        )
    )


@register(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size >= 25
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: distinct suppliers per part attribute group.",
)
def q16_part_supplier_counts(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customer",
    """
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem
                 WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN big    ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    doc="TPC-H Q18 shape: HAVING on a decimal sum gates a semi-join, top-25.",
)
def q18_large_volume_customer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 250)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "q22_dormant_customers",
    f"""
    WITH avg_bal AS (
        SELECT {sql_davg('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average balance + anti-join (never ordered).",
)
def q22_dormant_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    from .common import davg

    # decimal-exact average (plain double AVG is accumulation-order
    # dependent — a balance between the two engines' averages would flip
    # the filter and break the hash match)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "a09_collect_set_sorted",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS VARCHAR))), ',') AS linenos
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="collect_set made deterministic: sort_array before rendering.",
)
def a09_collect_set_sorted(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.sort_array(F.collect_set(F.col("l_linenumber").cast("string"))), ","
        ).alias("linenos"),
    )


@register(
    "q23_copurchase_lift",
    """
    WITH pairs AS (
        SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    pp AS (
        SELECT pa, pb, COUNT(*) AS n_ab FROM pairs
        GROUP BY pa, pb HAVING COUNT(*) >= 3
    ),
    op AS (
        SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem)
    SELECT pp.pa, pp.pb, CAST(pp.n_ab AS BIGINT) AS n_ab,
           ROUND(pp.n_ab * tot.n / (CAST(a.n_orders AS DOUBLE) * b.n_orders), 6)
               AS lift
    FROM pp
    JOIN op a ON pp.pa = a.l_partkey
    JOIN op b ON pp.pb = b.l_partkey
    CROSS JOIN tot
    ORDER BY lift DESC, pa ASC, pb ASC LIMIT 20
    """,
    category="relational",
    doc=(
        "market-basket co-purchase lift (frequent 2-itemsets): distinct "
        "part pairs within each order, support >= 3 orders, ranked by "
        "lift = P(ab)/(P(a)P(b)). The pair expansion is ORDER-LOCAL "
        "self-join on the order key — basket sizes are bounded (~7 "
        "lines), so pairs grow linearly with orders, never "
        "quadratically with parts; per-part order counts join back "
        "broadcastable and top-20 is TakeOrdered. The retail-analytics "
        "staple (and the d04-style blocked-pair shape applied to "
        "transactions instead of shingles)."
    ),
)
def q23_copurchase_lift(spark, sf_dir):
    from ..sources import spread_scan

    # spread_scan: the order-local pair expansion (the 17 MB-shuffle map
    # stage) ran on the single-row-group scan's 3 tasks (r13 profile);
    # no-op at scale
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    ).select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .distinct()
    )
    pp = (
        pairs.groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    op = li.groupBy("l_partkey").agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    tot = li.agg(F.count_distinct("l_orderkey").alias("n"))
    lift = F.round(
        F.col("n_ab") * F.col("n") / (F.col("na").cast("double") * F.col("nb")), 6
    )
    return (
        pp.join(
            F.broadcast(op.select(F.col("l_partkey").alias("pa"), F.col("n_orders").alias("na"))),
            "pa",
        )
        .join(
            F.broadcast(op.select(F.col("l_partkey").alias("pb"), F.col("n_orders").alias("nb"))),
            "pb",
        )
        .crossJoin(F.broadcast(tot))
        .select("pa", "pb", F.col("n_ab").cast("long").alias("n_ab"), lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("pa").asc(), F.col("pb").asc())
        .limit(20)
    )


@register(
    "q24_hierarchy_rollup",
    """
    WITH RECURSIVE h(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
        UNION ALL
        SELECT c.c_custkey, h.root, h.depth + 1
        FROM customer c JOIN h ON (c.c_custkey // 8) = h.custkey
        WHERE c.c_custkey >= 8
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
           CAST(MIN(custkey) AS BIGINT) AS first_key,
           CAST(MAX(custkey) AS BIGINT) AS last_key
    FROM h GROUP BY depth
    """,
    category="relational",
    doc=(
        "recursive-CTE hierarchy traversal (Spark 4 WITH RECURSIVE — "
        "the org-chart/BOM/category-tree query class): a synthetic "
        "customer tree (parent = custkey div 8, roots below 8) walked "
        "to every node's root and depth, rolled up per level. Each "
        "recursion step is one join of the frontier against the base "
        "relation — O(depth) iterations of broadcast-able frontier "
        "joins, the same shape d10's connected components uses "
        "manually; the engine now expresses it declaratively and both "
        "engines' recursive semantics (UNION ALL, monotone frontier) "
        "agree exactly."
    ),
)
def q24_hierarchy_rollup(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    c.createOrReplaceTempView("q24_customer")
    return spark.sql(
        """
        WITH RECURSIVE h(custkey, root, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM q24_customer WHERE c_custkey < 8
            UNION ALL
            SELECT c.c_custkey, h.root, h.depth + 1
            FROM q24_customer c JOIN h ON (c.c_custkey DIV 8) = h.custkey
            WHERE c.c_custkey >= 8
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
               CAST(MIN(custkey) AS BIGINT) AS first_key,
               CAST(MAX(custkey) AS BIGINT) AS last_key
        FROM h GROUP BY depth
        """
    )
