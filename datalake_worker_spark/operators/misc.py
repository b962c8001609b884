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


@register(
    "a10_statistical_aggregates",
    """
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS qty_var,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS qty_stddev,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS qty_price_corr
    FROM s
    """,
    doc=(
        "statistical aggregates (variance, stddev, correlation) computed "
        "from DECIMAL-exact moment sums so the floating-point reduction "
        "is order-independent — the built-in stddev/corr stream doubles "
        "in partition order and cannot hash-match across engines."
    ),
)
def a10_statistical_aggregates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag",
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("qty_var"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("qty_stddev"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("qty_price_corr"),
    )


@register(
    "a12_grouped_mode",
    """
    WITH c AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY event_type, user_id
    ), r AS (
        SELECT event_type, user_id, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id ASC) AS rn
        FROM c
    )
    SELECT event_type,
           CAST(user_id AS BIGINT) AS mode_user,
           CAST(n AS BIGINT) AS n_events
    FROM r WHERE rn = 1
    """,
    category="aggregation",
    doc=(
        "deterministic grouped mode (most frequent user per event type, "
        "ties to the smallest id): a pure TWO-PHASE aggregate — count "
        "per (group, value), then max_by over a (count, -value) struct "
        "— no per-group sort, no window, map-side partial aggregation "
        "at both phases. The built-in mode()/arg_max tie-break is "
        "engine-undefined, which is why profiling pipelines need the "
        "explicit struct ordering; the oracle expresses the same "
        "semantics through a window for cross-engine clarity."
    ),
)
def a12_grouped_mode(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    rank_key = F.struct(F.col("n"), (-F.col("user_id")).alias("neg_id"))
    return counts.groupBy("event_type").agg(
        F.max_by("user_id", rank_key).cast("long").alias("mode_user"),
        F.max("n").cast("long").alias("n_events"),
    )


@register(
    "a14_retention_cohorts",
    """
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        FROM events
    ),
    first_seen AS (
        SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST((epoch(w.week) - epoch(f.cohort_week)) / 604800 AS BIGINT)
               AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM weekly w JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
    category="aggregation",
    doc=(
        "weekly retention cohort matrix (the product-analytics staple): "
        "users keyed to their first-activity week, then counted per "
        "(cohort_week, week_offset) of later activity. Shape: one "
        "DISTINCT collapse of events to user-weeks (two-phase, map-side "
        "combined — the only pass over raw events), a per-user MIN, and "
        "a broadcastable user->cohort join (user-week rows are corpus/"
        "1000s smaller than events); offsets are exact integer week "
        "arithmetic on week-truncated timestamps. COUNT(*) over "
        "already-distinct user-weeks replaces COUNT(DISTINCT user) in "
        "the final aggregate, keeping every phase partial-aggregable."
    ),
)
def a14_retention_cohorts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    first_seen = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    return (
        weekly.join(first_seen, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )
