"""Window functions & sort/limit/top-k operators (SURVEY.md §2.2).

Per-group top-k is always a window + row_number (never a driver-side
collect-and-sort): at 100 TB the window shuffles once on the partition
key and each partition is processed independently.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .common import dec


@register(
    "w01_topk_per_group",
    """
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    doc="top-3 orders by price per priority: row_number window, key tie-break.",
)
def w01_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rn",
        )
    )


@register(
    "w02_rank_dense_ntile",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4)     OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    doc="rank / dense_rank / ntile over a deterministic ordering.",
)
def w02_rank_dense_ntile(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "w03_running_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total,
           CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_order,
           CAST(LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="running sum (decimal-exact), lag/lead, first/last over full frame.",
)
def w03_running_lag_lead(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(wrun).cast("double").alias("running_total"),
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        F.first("o_orderkey").over(w).cast("long").alias("first_order"),
        F.last("o_orderkey").over(wall).cast("long").alias("last_order"),
    )


@register(
    "w04_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS orders_last_90d
    FROM orders
    """,
    doc="RANGE frame over epoch seconds: orders in trailing 90 days per customer.",
)
def w04_range_frame(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-90 * 24 * 3600, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).cast("long").alias("orders_last_90d"),
    )


@register(
    "w07_percent_rank_cume",
    """
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST()    OVER w, 6) AS cd
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal ASC, s_suppkey ASC)
    """,
    doc=(
        "percent_rank / cume_dist over a global deterministic ordering — "
        "computed by the distributed-exact rank recipe "
        "(range-partitioned sort + per-partition offsets), never an "
        "unpartitioned window: supplier is dimension-sized here, but "
        "the same operator over a fact table must not funnel through "
        "one task."
    ),
)
def w07_percent_rank_cume(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    ranked = distributed_percent_rank(
        s,
        [F.col("s_acctbal").asc(), F.col("s_suppkey").asc()],
        cume_col="cd_raw",
    )
    return ranked.select(
        "s_suppkey",
        F.round(F.col("pr"), 6).alias("pr"),
        F.round(F.col("cd_raw"), 6).alias("cd"),
    )


@register(
    "w05_multikey_sort_limit",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(l_extendedprice AS DOUBLE) AS price
    FROM lineitem
    ORDER BY l_returnflag ASC, price DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 50
    """,
    doc="multi-key global sort + limit (TakeOrderedAndProject — no full sort at scale).",
)
def w05_multikey_sort_limit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("price").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(50)
    )


def sessionize(
    df,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tie_col: str,
    out_col: str = "session_id",
):
    """Gap-based sessionization: rows of one key whose inter-arrival gap
    exceeds ``gap_seconds`` start a new session. One shuffle on the key,
    one sorted pass — the batch analog of ``session_window``.

    Returns df + ``out_col`` (1-based per key, in time order).
    """
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists on the input")
    flag = out_col + "__new_flag"
    while flag in df.columns:
        flag += "_"
    w = W.partitionBy(key_col).orderBy(ts_col, tie_col)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(ts_col).over(w)
    # full-microsecond gap math (unix_timestamp truncates to seconds —
    # cast to double keeps the fraction, matching DuckDB's epoch()).
    new_session = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(flag, new_session).withColumn(
        out_col, F.sum(flag).over(wrun).cast("long")
    ).drop(flag)


def sessionize_sliced(
    df,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tie_col: str,
    out_col: str = "session_id",
    slice_seconds: float = 86400.0,
):
    """Giant-key-safe sessionization (SCALE.md windows section).

    ``sessionize`` puts ALL rows of one key in one task — a key with
    billions of events (bot traffic, a shared device id) stalls the
    stage. This variant shards the wide work on (key, time-slice) and
    repairs sessions that span slice boundaries with a second pass over
    per-slice SUMMARIES (one row per non-empty slice per key):

      1. local sessionization within each (key, slice) shard;
      2. per shard: local session count m, min/max ts; a lag over the
         key's shard summaries marks shards whose first session continues
         the previous shard's last session (boundary gap <= gap_seconds):
         merge flag mu, new-session offset = running Σ (m - mu);
      3. broadcast-scale join back: global id = offset + local_id - mu.

    Equivalent to ``sessionize`` for any slice_seconds (property-tested);
    the longest chain a single task sees is one slice of one key.
    """
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists on the input")
    slice_c = F.floor(F.col(ts_col).cast("double") / slice_seconds)
    base = df.withColumn("__slice", slice_c)
    w = W.partitionBy(key_col, "__slice").orderBy(ts_col, tie_col)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(ts_col).over(w)
    new_flag = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    local = base.withColumn("__local_sid", F.sum(new_flag).over(wrun).cast("long"))

    summ = local.groupBy(key_col, "__slice").agg(
        F.max("__local_sid").alias("__m"),
        F.min(F.col(ts_col).cast("double")).alias("__min_ts"),
        F.max(F.col(ts_col).cast("double")).alias("__max_ts"),
    )
    ws = W.partitionBy(key_col).orderBy("__slice")
    prev_max = F.lag("__max_ts").over(ws)
    mu = F.when(
        prev_max.isNotNull() & ((F.col("__min_ts") - prev_max) <= gap_seconds), 1
    ).otherwise(0)
    wcum = ws.rowsBetween(W.unboundedPreceding, W.currentRow)
    summ = (
        summ.withColumn("__mu", mu)
        .withColumn(
            "__offset",
            (F.sum(F.col("__m") - F.col("__mu")).over(wcum) - (F.col("__m") - F.col("__mu"))).cast("long"),
        )
        .select(key_col, "__slice", "__mu", "__offset")
    )
    out = (
        local.join(summ, [key_col, "__slice"])
        .withColumn(
            out_col,
            (F.col("__offset") + F.col("__local_sid") - F.col("__mu")).cast("long"),
        )
        .drop("__slice", "__local_sid", "__mu", "__offset")
    )
    return out


@register(
    "w06_sessionization",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800.0
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), s AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, session_id
    """,
    doc="batch sessionization: lag-gap flag + running sum = session ids (30 min gap).",
)
def w06_sessionization(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        sessionize(e, "user_id", "ts", 1800.0, "event_id")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )


@register(
    "w08_time_grid_fill",
    """
    WITH c AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, h
    ),
    b AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM c GROUP BY event_type),
    g AS (
        SELECT event_type, CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS h
        FROM b
    )
    SELECT g.event_type, g.h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
    """,
    category="windows",
    doc=(
        "time-series gap fill: hourly counts per event type joined onto a "
        "dense per-type hour grid (sequence between each type's min/max "
        "hour), missing hours surfaced as 0. The grid generates from the "
        "per-type BOUNDS (one row per type), so grid size is O(types x "
        "span), independent of event count -- at 100 TB the left join is "
        "a broadcast of the aggregated counts' keys, never raw events."
    ),
)
def w08_time_grid_fill(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    )
    counts = e.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    bounds = counts.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    return grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


@register(
    "w10_rolling_zscore",
    """
    WITH s AS (
        SELECT event_id, user_id, ts, value,
               COUNT(*) OVER fr AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE) AS sxx
        FROM events
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts,
           CAST(value AS DOUBLE) AS value,
           CAST(cnt AS BIGINT) AS n_window,
           ROUND((value - sx / cnt)
                 / sqrt((sxx - sx * sx / cnt) / (cnt - 1)), 6) AS zscore
    FROM s
    WHERE cnt >= 12
      AND (sxx - sx * sx / cnt) / (cnt - 1) > 1e-12
      AND abs((value - sx / cnt)
              / sqrt((sxx - sx * sx / cnt) / (cnt - 1))) > 2.0
    """,
    doc=(
        "rolling z-score anomaly detection: per-user trailing-20-event "
        "window (excluding the current row), events more than 2 sigma "
        "from the trailing mean are flagged. Moments are DECIMAL-exact "
        "sums over the frame (a10's order-independence trick applied to "
        "window frames), so both engines compute bit-identical "
        "statistics. One shuffle on user_id; each user's timeline is "
        "processed independently — the standard telemetry/quality-drift "
        "monitor shape at any event volume."
    ),
)
def w10_rolling_zscore(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    s = e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count("*").over(fr).alias("cnt"),
        F.sum(v).over(fr).cast("double").alias("sx"),
        F.sum(v * v).over(fr).cast("double").alias("sxx"),
    )
    cnt, sx, sxx = F.col("cnt"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / cnt) / (cnt - 1)
    z = (F.col("value") - sx / cnt) / F.sqrt(var)
    return (
        s.filter((cnt >= 12) & (var > 1e-12) & (F.abs(z) > 2.0))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("value").cast("double").alias("value"),
            cnt.cast("bigint").alias("n_window"),
            F.round(z, 6).alias("zscore"),
        )
    )


@register(
    "w11_scd2_intervals",
    """
    WITH dedup AS (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts
        FROM dedup
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               AS is_current
    FROM changes
    """,
    doc=(
        "SCD2 history build: per-user event-type timeline collapsed to "
        "change rows (consecutive repeats dropped), each opening a "
        "[valid_from, valid_to) interval closed by the next change; the "
        "open interval is flagged current. Two windows over the same "
        "user_id partitioning — one shuffle, reused across both stages "
        "(no exchange between them). The standard warehouse "
        "dimension-versioning primitive; pairs with x05's "
        "point-in-interval lookup for as-of dimension joins."
    ),
)
def w11_scd2_intervals(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w_ord).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    w_iv = W.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w_iv)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "w12_running_distinct_users",
    """
    WITH flagged AS (
        SELECT event_type, ts, event_id,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY event_type, user_id ORDER BY ts, event_id
               ) = 1 THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_type, ts, event_id,
           CAST(SUM(first_seen) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_users_so_far
    FROM flagged
    """,
    doc=(
        "running COUNT(DISTINCT) — which no engine supports as a window "
        "frame directly — decomposed into its standard exact form: flag "
        "each user's first occurrence per event_type (one row_number "
        "window), then a running SUM of the flags. Two windows, but the "
        "second partitions on a prefix of the first's keys, so one "
        "hash exchange serves both (extra sort only). O(1) frame state; "
        "the cumulative-audience metric every funnel dashboard needs. "
        "At extreme per-timestamp output width, swap the running sum "
        "for windowed HLL merges (a11) and accept the approximation."
    ),
)
def w12_running_distinct_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    first_w = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    run_w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = e.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return flagged.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("first_seen").over(run_w).cast("long").alias(
            "distinct_users_so_far"
        ),
    )


@register(
    "w13_time_weighted_average",
    """
    WITH s AS (
        SELECT user_id, value,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE), 6) AS twap
    FROM s
    GROUP BY user_id
    HAVING SUM(dt_us) > 0
    """,
    category="windows",
    doc=(
        "time-weighted average (TWAP): each event's value holds until "
        "the user's next event; the weight is the microsecond gap to "
        "that event (lead over a per-user time-ordered window), the "
        "last event carries no interval. The weighted sum rides "
        "DECIMAL x BIGINT-microseconds — exact and order-independent, "
        "so the result is partitioning-stable (the irregularly-sampled "
        "telemetry aggregate a naive AVG gets wrong whenever sampling "
        "density correlates with value). One shuffle on user_id shared "
        "by the window and the aggregate."
    ),
)
def w13_time_weighted_average(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    s = e.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (F.lead(t).over(w) - t).alias("dt_us"),
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("v") * F.col("dt_us")).alias("_w"),
            F.sum("dt_us").alias("_t"),
        )
        .filter(F.col("_t") > 0)
        .select(
            "user_id",
            "n_events",
            F.round(
                F.col("_w").cast("double") / F.col("_t").cast("double"), 6
            ).alias("twap"),
        )
    )


@register(
    "w14_ohlc_bars",
    """
    WITH o AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
               FIRST_VALUE(value) OVER w AS open,
               LAST_VALUE(value) OVER
                 (PARTITION BY user_id, date_trunc('day', ts)
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS close
        FROM events
        WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                     ORDER BY ts, event_id)
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(open) AS open, MAX(value) AS high,
           MIN(value) AS low, MIN(close) AS close
    FROM o
    GROUP BY user_id, day
    """,
    category="windows",
    doc=(
        "OHLC bars (open/high/low/close per user per day): first/last "
        "value by explicit (ts, event_id) order — deterministic under "
        "ties, unlike arg_min/arg_max whose tie-break is undefined — "
        "plus min/max aggregates. The window and the aggregate share "
        "one (user_id, day) shuffle; the standard downsampling rollup "
        "for irregular time-series (telemetry, market data)."
    ),
)
def w14_ohlc_bars(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    # project the bar key FIRST: windowing on the raw date_trunc
    # expression while grouping on its alias defeats Catalyst's
    # partitioning-reuse and costs a second Exchange (measured 2 -> 1)
    base = e.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
        "ts",
        "event_id",
    )
    wf = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wall = wf.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    o = base.select(
        "user_id",
        "day",
        "value",
        F.first("value").over(wf).alias("open"),
        F.last("value").over(wall).alias("close"),
    )
    return o.groupBy("user_id", "day").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min("close").alias("close"),
    )


#: how distributed_percent_rank avoids recomputing its upstream between
#: the offsets action and the caller's final job: "checkpoint" (eager
#: localCheckpoint — truncates lineage), "persist" (lazy cache,
#: materialized by the offsets action), "none" (recompute upstream
#: twice). Measured on smp10 (token-explode-heavy upstream) at sf0.1
#: AND the 10x probe: see the module's measurement note below.
PERCENT_RANK_MATERIALIZE = "persist"


def distributed_percent_rank(
    df,
    order_by: list,
    out_col: str = "pr",
    n_parts: int | None = None,
    cume_col: str | None = None,
    materialize: str | None = None,
):
    """Exact global percent_rank WITHOUT a single-partition sort.

    An unpartitioned window (`W.orderBy(...)`) funnels every row through
    one task — the classic 100 TB cliff. The distributed-exact recipe:

    1. ``repartitionByRange`` on the ranking order (a DISTRIBUTED sort:
       range exchange + in-partition sort);
    2. materialize the partition id BEFORE any further exchange, take
       partition-local row numbers;
    3. per-partition counts collect to the driver (≤ shuffle-partitions
       rows — model-state scale, like k-means centroids), prefix-summed
       into offsets, and broadcast back;
    4. global rank = offset(pid) + local row number; percent_rank =
       (rank-1)/(N-1), identical to the window definition because the
       ordering is total (callers must include a unique tie-break).

    Costs one extra narrow exchange (the pid-window) vs the
    single-partition form, in exchange for full parallelism. Range
    boundaries come from sampling, but any boundary choice yields the
    same total order, so ranks are deterministic regardless.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = df.repartitionByRange(n_parts, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    wloc = W.partitionBy("_pid").orderBy(*order_by)
    # materialize the ranked rows once (narrow: input cols + two ints):
    # the offsets pass below is an eager action, and without reuse the
    # caller's plan would recompute the whole upstream DAG a second
    # time. Lazy persist won the measurement (tools_time_queries.py,
    # smp10 at sf0.1 and at the 10x probe): the offsets action fills the
    # cache it then reads, while eager localCheckpoint pays a separate
    # full materialization pass up front.
    d = d.withColumn("_lrn", F.row_number().over(wloc))
    mode = materialize or PERCENT_RANK_MATERIALIZE
    if mode == "checkpoint":
        d = d.localCheckpoint(eager=True)
    elif mode == "persist":
        d = d.persist()
    counts = sorted(
        (r["_pid"], r["_n"])
        for r in d.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    )
    total = sum(n for _, n in counts)
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    denom = float(total - 1) if total > 1 else 1.0
    out = d.join(off_df, "_pid").withColumn(
        out_col, (F.col("_off") + F.col("_lrn") - 1) / F.lit(denom)
    )
    if cume_col is not None:
        # unique total order => cume_dist = rank / N exactly
        out = out.withColumn(
            cume_col, (F.col("_off") + F.col("_lrn")) / F.lit(float(total))
        )
    return out.drop("_pid", "_lrn", "_off")


@register(
    "w15_funnel_steps",
    """
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                            AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ),
    per_user AS (
        SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM w3 GROUP BY user_id
    )
    SELECT CAST(COUNT(t1) AS BIGINT) AS n_viewed,
           CAST(COUNT(t2) AS BIGINT) AS n_clicked,
           CAST(COUNT(t3) AS BIGINT) AS n_purchased,
           ROUND(COUNT(t3) / CAST(COUNT(t1) AS DOUBLE), 6) AS conversion
    FROM per_user
    """,
    category="window",
    doc=(
        "ordered funnel conversion (view -> click -> purchase within 7 "
        "days of the first view): each step's earliest qualifying "
        "timestamp is a conditional MIN window over the SAME user "
        "partitioning, so the three dependent steps stack on ONE "
        "user-keyed Exchange (no self-joins — the naive k-step funnel "
        "is k-1 self-joins, k-1 shuffles); the per-user collapse reuses "
        "that partitioning and only step counts leave the executors. "
        "The event-analytics staple every OLAP engine demos; step "
        "dependence (t2 > t1, t3 > t2) is what plain grouped "
        "conditional aggregation cannot express."
    ),
)
def w15_funnel_steps(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    wu = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    d1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(wu)
    d2 = d1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS")),
            F.col("ts"),
        )
    ).over(wu)
    per_user = (
        d2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    return per_user.agg(
        F.count("t1").cast("long").alias("n_viewed"),
        F.count("t2").cast("long").alias("n_clicked"),
        F.count("t3").cast("long").alias("n_purchased"),
        F.round(F.count("t3") / F.count("t1").cast("double"), 6).alias("conversion"),
    )


@register(
    "w16_mad_outliers",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(MAX(d.med), 6) AS med,
           ROUND(MAX(m.mad), 6) AS mad
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    category="window",
    doc=(
        "robust outlier detection per group via median absolute "
        "deviation (the 3-sigma rule's skew/heavy-tail-safe replacement "
        "— a data-quality gate mean/stddev z-scores fail on): exact "
        "interpolated medians (smp03's percentile parity), per-row "
        "absolute deviations against the BROADCAST per-group median, a "
        "second median pass for the MAD, and a final counted flag at "
        "the 3 x 1.4826 consistency threshold. Two aggregate passes "
        "over the fact table plus two broadcastable group-constant "
        "joins — no window sort, identical double arithmetic on both "
        "engines so the flag comparisons agree exactly. Exact "
        "percentile collects a group's values on one executor (fine up "
        "to ~10^8 rows/group); past that swap both medians for "
        "approx_percentile — MAD tolerates sketched medians and the "
        "flag comparison itself stays row-local."
    ),
)
def w16_mad_outliers(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
        )
    )
