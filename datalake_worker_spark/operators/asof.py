"""As-of joins and range joins (SURVEY.md §2.2 "joins": as-of, theta/range).

Spark has no native AS OF join. The scalable pattern used here is
union + window ("last known value"):

  1. tag right-side rows (the lookup stream) and left-side rows (probes),
  2. union them on the join key,
  3. sort within each key by (ts, tag, tie-break) — one shuffle total,
  4. ``last(value, ignorenulls=True)`` over the running frame gives each
     probe the most recent right-side row with ts <= probe ts.

Unlike the naive range-join + row_number approach this never builds the
O(probes × candidates) intermediate, so it survives 100 TB: cost is one
shuffle + one sorted window pass, both on the join key.

Range joins against a small bucket/dimension table broadcast the dim and
let the executor filter (BroadcastNestedLoopJoin on the non-equi part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Generic as-of join: for each left row, attach the right row with the
    greatest (right_ts, tie_col) such that right_ts <= left_ts.

    Returns the left columns plus ``asof_<value_col>`` columns.
    """
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_probe"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(r.schema[f"_v_{c}"].dataType).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c) for c in lcols],
    )
    r = r.select(
        "_k", "_ts", "_is_probe", "_tie",
        *[F.col(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    u = r.unionByName(l)
    # right rows sort before a probe at the same ts (tag 0 < 1) ⇒ "<=" as-of.
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_is_probe", "_tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = u.select(
        *lcols,
        F.col("_is_probe"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("_is_probe") == 1).drop("_is_probe")


@register(
    "x01_asof_purchase_click",
    """
    WITH u AS (
        SELECT user_id, ts, 0 AS is_probe, event_id AS tie,
               event_id AS click_id, NULL::BIGINT AS probe_id
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS is_probe, NULL AS tie,
               NULL AS click_id, event_id AS probe_id
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT probe_id, is_probe,
               last_value(click_id IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_probe, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_event_id
        FROM u
    )
    SELECT probe_id AS event_id, asof_event_id
    FROM w WHERE is_probe = 1
    """,
    doc="as-of join: each purchase ↔ most recent click (<= ts) of the same user.",
)
def x01_asof_purchase_click(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id"],
        tie_col="event_id",
    )
    return out.select("event_id", F.col("asof_event_id"))


@register(
    "x02_asof_event_order",
    """
    WITH u AS (
        SELECT o_custkey AS k, o_orderdate AS ts, 0 AS is_probe, o_orderkey AS tie,
               o_orderkey AS val, NULL::BIGINT AS probe_id
        FROM orders
        UNION ALL
        SELECT user_id AS k, ts, 1 AS is_probe, NULL AS tie,
               NULL AS val, event_id AS probe_id
        FROM events
    ), w AS (
        SELECT probe_id, is_probe,
               last_value(val IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY ts, is_probe, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_o_orderkey
        FROM u
    )
    SELECT probe_id AS event_id, asof_o_orderkey
    FROM w WHERE is_probe = 1
    """,
    doc="as-of join across tables: event ↔ latest order (o_orderdate <= ts) of that customer.",
)
def x02_asof_event_order(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    o = load_table(spark, sf_dir, "orders")
    out = asof_join(
        e,
        o.select(F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey"],
        tie_col="o_orderkey",
    )
    return out.select("event_id", "asof_o_orderkey")


@register(
    "x03_range_join_buckets",
    """
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (VALUES ('small', 0.0, 50.0), ('mid', 50.0, 150.0), ('large', 150.0, 1e9))
         t(tier, lo, hi)
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
    doc="range join against a broadcast tier dimension (non-equi condition).",
)
def x03_range_join_buckets(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("small", 0.0, 50.0), ("mid", 50.0, 150.0), ("large", 150.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        e.join(
            F.broadcast(tiers),
            (e.value >= tiers.lo) & (e.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "x04_asof_join_tolerance",
    """
    WITH u AS (
        SELECT user_id, ts, 0 AS is_probe, event_id AS tie,
               event_id AS click_id, ts AS click_ts, NULL::BIGINT AS probe_id
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS is_probe, NULL AS tie,
               NULL AS click_id, NULL AS click_ts, event_id AS probe_id
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT probe_id, is_probe, ts,
               last_value(click_id IGNORE NULLS) OVER win AS a_id,
               last_value(click_ts IGNORE NULLS) OVER win AS a_ts
        FROM u
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_probe, tie
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT probe_id AS event_id,
           CASE WHEN a_ts IS NOT NULL AND epoch(ts) - epoch(a_ts) <= 3600.0
                THEN a_id END AS asof_click_id
    FROM w WHERE is_probe = 1
    """,
    doc=(
        "as-of join with tolerance (pandas merge_asof semantics): each "
        "purchase matches its most recent same-user click only if it is "
        "within 1 hour; staler matches surface as NULL. Same single-"
        "shuffle union+window construction as x01 — the tolerance is a "
        "post-window predicate on the carried match timestamp, so the "
        "scale shape is unchanged."
    ),
)
def x04_asof_join_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id", "click_ts"],
        tie_col="click_id",
    )
    return out.select(
        "event_id",
        F.when(
            F.col("asof_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"),
            F.col("asof_click_id"),
        ).alias("asof_click_id"),
    )


@register(
    "x05_interval_lookup_join",
    """
    WITH bands(band_id, lo, hi) AS (
        VALUES (0, 0.0, 2000.0), (1, 2000.0, 10000.0), (2, 10000.0, 50000.0),
               (3, 50000.0, 200000.0), (4, 200000.0, 1000000.0)
    )
    SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id, lo, hi
    """,
    doc=(
        "point-in-interval lookup join (the IP-range / price-band / "
        "geo-tier pattern): each fact row lands in the one interval that "
        "contains it. The interval dim is tiny and non-uniform, so the "
        "scale-correct plan is broadcast + non-equi filter "
        "(BroadcastNestedLoopJoin): zero shuffle of the fact side, the "
        "predicate runs in the scan stage. For UNIFORM intervals the "
        "equi-key alternative is floor(p/width) bucketing (no BNLJ at "
        "all); kept non-uniform here to exercise the broadcast path."
    ),
)
def x05_interval_lookup_join(spark, sf_dir):
    bands = spark.createDataFrame(
        [
            (0, 0.0, 2000.0),
            (1, 2000.0, 10000.0),
            (2, 10000.0, 50000.0),
            (3, 50000.0, 200000.0),
            (4, 200000.0, 1000000.0),
        ],
        "band_id int, lo double, hi double",
    )
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    p = F.col("o_totalprice")
    return (
        o.join(F.broadcast(bands), (p >= F.col("lo")) & (p < F.col("hi")))
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(p.cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "x06_asof_join_nearest",
    """
    WITH u AS (
        SELECT user_id, ts, 0 AS is_probe, event_id AS tie,
               event_id AS click_id, ts AS click_ts, NULL::BIGINT AS probe_id
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS is_probe, NULL AS tie,
               NULL AS click_id, NULL AS click_ts, event_id AS probe_id
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT probe_id, is_probe, ts,
               last_value(click_id IGNORE NULLS) OVER back AS b_id,
               last_value(click_ts IGNORE NULLS) OVER back AS b_ts,
               first_value(click_id IGNORE NULLS) OVER fwd AS f_id,
               first_value(click_ts IGNORE NULLS) OVER fwd AS f_ts
        FROM u
        WINDOW back AS (PARTITION BY user_id ORDER BY ts, is_probe, tie
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY user_id ORDER BY ts, is_probe, tie
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT probe_id AS event_id,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                     OR epoch_us(ts) - epoch_us(b_ts)
                        <= epoch_us(f_ts) - epoch_us(ts))
                THEN b_id ELSE f_id END AS nearest_click_id,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                     OR epoch_us(ts) - epoch_us(b_ts)
                        <= epoch_us(f_ts) - epoch_us(ts))
                THEN CAST(epoch_us(ts) - epoch_us(b_ts) AS BIGINT)
                ELSE CAST(epoch_us(f_ts) - epoch_us(ts) AS BIGINT)
                END AS dist_us
    FROM w WHERE is_probe = 1
    """,
    doc=(
        "nearest-direction as-of join (pandas merge_asof "
        "direction='nearest'): each purchase matches its temporally "
        "closest same-user click, before OR after; equidistant ties "
        "resolve to the earlier (backward) click. Implemented as ONE "
        "union + ONE shuffle + ONE sort with two frames over the same "
        "ordering (carry-last backward, carry-first forward) — the "
        "single-Exchange scale shape of x01 preserved; a naive "
        "nearest-neighbor range join would be O(probes x candidates)."
    ),
)
def x06_asof_join_nearest(spark, sf_dir):
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.col("event_id").alias("tie"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("probe_id"),
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("tie"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("probe_id"),
    )
    u = clicks.unionByName(probes)
    order = [F.col("ts"), F.col("is_probe"), F.col("tie")]
    back = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    w = u.select(
        "probe_id",
        "is_probe",
        "ts",
        F.last("click_id", ignorenulls=True).over(back).alias("b_id"),
        F.last("click_ts", ignorenulls=True).over(back).alias("b_ts"),
        F.first("click_id", ignorenulls=True).over(fwd).alias("f_id"),
        F.first("click_ts", ignorenulls=True).over(fwd).alias("f_ts"),
    ).filter(F.col("is_probe") == 1)
    b_dist = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    f_dist = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    take_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_dist <= f_dist)
    )
    return w.select(
        F.col("probe_id").alias("event_id"),
        F.when(take_back, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "nearest_click_id"
        ),
        F.when(take_back, b_dist)
        .otherwise(f_dist)
        .cast("long")
        .alias("dist_us"),
    )


@register(
    "x07_last_touch_attribution",
    """
    WITH seq AS (
        SELECT event_id, user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_click_ts
        FROM events
    )
    SELECT event_id, user_id, ts, last_click_ts,
           CAST(last_click_ts IS NOT NULL
                AND last_click_ts >= ts - INTERVAL 3 DAY AS INT) AS attributed
    FROM seq WHERE event_type = 'purchase'
    """,
    category="asof",
    doc=(
        "last-touch attribution (every purchase credited to the user's "
        "most recent click within 3 days): the as-of join expressed as "
        "a SINGLE running-MAX window when both streams share the "
        "partition key — no join at all, one user-keyed shuffle and one "
        "sorted pass, versus the generic two-table as-of machinery "
        "(x01/x02) that exists for streams which don't. (ts, event_id) "
        "ordering makes same-timestamp sequences deterministic on both "
        "engines. The marketing/feature-store staple."
    ),
)
def x07_last_touch_attribution(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        e.select("event_id", "user_id", "ts", "event_type")
        .withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_click_ts",
            (
                F.col("last_click_ts").isNotNull()
                & (F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 3 DAYS"))
            ).cast("int").alias("attributed"),
        )
    )


@register(
    "x09_temporal_anti_join",
    """
    WITH u AS (
        SELECT user_id, ts, 0 AS is_probe, event_id AS tie,
               ts AS click_ts, NULL::BIGINT AS probe_id
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS is_probe, NULL AS tie,
               NULL AS click_ts, event_id AS probe_id
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT user_id, probe_id, is_probe, ts,
               last_value(click_ts IGNORE NULLS) OVER win AS a_ts
        FROM u
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_probe, tie
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN a_ts IS NULL
                          OR epoch(ts) - epoch(a_ts) > 3600.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           ROUND(SUM(CASE WHEN a_ts IS NULL
                           OR epoch(ts) - epoch(a_ts) > 3600.0
                          THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS orphan_ratio
    FROM w WHERE is_probe = 1
    GROUP BY user_id
    """,
    doc=(
        "temporal ANTI join — the negative of the as-of family: "
        "purchases with NO same-user click in the preceding hour "
        "(orphan conversions: the bot/fraud/broken-tracking signal "
        "x01-x08 cannot express, since they all return the MATCH). A "
        "naive NOT EXISTS with a time-range predicate plans as a "
        "nested-loop anti join; this reuses x04's single-shuffle "
        "union+window as-of construction — the anti condition is just "
        "IS NULL / outside-tolerance on the carried match timestamp, "
        "so the scale shape (one user-keyed exchange, no quadratic "
        "pairing) is identical to the positive as-of. Output: per-user "
        "purchase/orphan counts and ratio."
    ),
)
def x09_temporal_anti_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_ts"],
        tie_col="click_id",
    )
    orphan = (
        F.col("asof_click_ts").isNull()
        | (F.col("asof_click_ts") < F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    ).cast("long")
    return out.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum(orphan).cast("long").alias("n_orphans"),
        F.round(F.sum(orphan) / F.count("*").cast("double"), 6).alias(
            "orphan_ratio"
        ),
    )
