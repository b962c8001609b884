"""Scalar function batteries: string, date/time, math, array/map/json,
conditional (SURVEY.md §2.2 "scalar fns").

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd.
Row-level scalar results are order-independent by construction, so the
only cross-engine risk is libm last-ulp drift, absorbed by the 6 dp
canonical rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "s01_string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           CAST(REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS name_masked,
           CONCAT(c_mktsegment, '/', c_name) AS seg_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           TRIM('  ' || c_mktsegment || ' ') AS seg_trim,
           CONTAINS(c_name, '0000001') AS has_1m
    FROM customer
    """,
    doc="concat/substr/upper/lower/trim/regexp/length/lpad/contains.",
)
def s01_string_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("cust_num"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.col("c_name").contains("0000001").alias("has_1m"),
    )


@register(
    "s02_datetime_funcs",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate)  AS INTEGER) AS yr,
           CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
           CAST(DAY(o_orderdate)   AS INTEGER) AS dy,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER)
               AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow
    FROM orders
    """,
    doc="year/month/day, date_trunc, date_add, datediff, unix_timestamp, to_date.",
)
def s02_datetime_funcs(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@register(
    "s03_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity) AS qty_round,
           FLOOR(l_extendedprice) AS price_floor,
           CEIL(l_extendedprice)  AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10
    FROM lineitem
    """,
    doc="round/floor/ceil/abs/pow/log/sqrt/pmod — rounded to 6 dp where libm is involved.",
)
def s03_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity").alias("qty_round"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
    )


@register(
    "s04_array_funcs",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_tokens,
           list_contains(w, 'spark') AS has_spark,
           list_sort(w)[1] AS first_sorted,
           list_sort(w)[len(w)] AS last_sorted,
           array_to_string(list_sort(list_distinct(w))[1:3], ',') AS first3
    FROM d
    """,
    doc="split/size/array_distinct/array_contains/sort_array/slice/array_join.",
)
def s04_array_funcs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.split("text", " ")
    )
    return d.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_distinct_tokens"),
        F.array_contains("w", "spark").alias("has_spark"),
        F.element_at(F.sort_array("w"), 1).alias("first_sorted"),
        F.element_at(F.sort_array("w"), F.size("w")).alias("last_sorted"),
        F.array_join(F.slice(F.sort_array(F.array_distinct("w")), 1, 3), ",").alias(
            "first3"
        ),
    )


@register(
    "s05_explode_tokens",
    """
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 15
    """,
    doc="explode → token frequency top-15 (deterministic tie-break).",
)
def s05_explode_tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(15)
    )


@register(
    "s06_posexplode",
    """
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id < 20
    """,
    doc="posexplode: token with ordinal position.",
)
def s06_posexplode(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@register(
    "s07_json_map",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="get_json_object on a JSON string column + integer aggregation.",
)
def s07_json_map(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    m = F.create_map(F.lit("k"), k)  # exercise MapType plumbing
    return (
        e.withColumn("k", F.element_at(m, F.lit("k")))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "s10_map_funcs",
    """
    SELECT event_id,
           array_to_string(map_keys(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS keys_joined,
           array_to_string(map_values(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS values_joined,
           CAST(cardinality(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS INTEGER) AS map_size,
           struct_extract(from_json(props, '{"k": "BIGINT"}'), 'k') AS k_from_struct
    FROM events
    WHERE event_id % 7 = 0
    """,
    doc="map construction, map_keys/values/size, from_json to struct + field extract.",
)
def s10_map_funcs(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.array_join(F.map_values(m), ",").alias("values_joined"),
        F.size(m).alias("map_size"),
        parsed.getField("k").alias("k_from_struct"),
    )


@register(
    "s09_casts",
    """
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_quantity AS VARCHAR) AS qty_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           (l_discount > 0.05) AS is_discounted,
           CAST((l_discount > 0.05) AS INTEGER) AS is_discounted_int,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
    doc="cast battery: double↔int↔string↔decimal↔bool↔date round-trips.",
)
def s09_casts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        # decimal round-trips back to double: the driver's canonicalizer
        # renders bare DECIMAL with trailing zeros while DuckDB strips them
        # (round-1 hash mismatch) — only driver-canonicalizable types leave.
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        (F.col("l_discount") > 0.05).alias("is_discounted"),
        (F.col("l_discount") > 0.05).cast("int").alias("is_discounted_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
    )


@register(
    "s08_conditional",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_tier,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax)    AS min_rate,
           (l_quantity > 25 AND l_discount > 0.05) AS bulk_deal
    FROM lineitem
    """,
    doc="CASE/COALESCE/NULLIF/GREATEST/LEAST/boolean projection.",
)
def s08_conditional(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_tier"),
        F.coalesce(F.expr("NULLIF(l_returnflag, 'N')"), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        ((F.col("l_quantity") > 25) & (F.col("l_discount") > 0.05)).alias("bulk_deal"),
    )
