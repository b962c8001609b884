"""Round-7 operator wave: corpus statistics, exact weighted/rolling
order statistics, a binned range join, and an embedding-truncation
audit — each DuckDB-oracle-backed with identical aliases/casts.

Scale notes are inline per operator; the shared rules: DECIMAL for
order-independent float sums, ROUND(_, 6) where libm is involved,
BIGINT casts for counts, unique-key tie-breaks on every ranking.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..scratch import scratch_dir
from ..functions.similarity import exact_topk, to_double_array
from ..functions.text import whitespace_tokens
from ..registry import register
from ..sources import load_table
from .common import sql_cast_double, sql_dsum


@register(
    "t23_zipf_token_curve",
    r"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM toks),
    counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    top AS (
        SELECT tok, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS BIGINT)
                 AS rank
        FROM counts ORDER BY n DESC, tok ASC LIMIT 20
    )
    SELECT rank, tok, CAST(n AS BIGINT) AS n,
           ROUND(CAST(SUM(n) OVER (ORDER BY rank) AS DOUBLE)
                 / (SELECT total FROM tot), 6) AS cum_share
    FROM top
    """,
    category="llm-text",
    doc=(
        "Zipf curve head: the 20 most frequent tokens with rank and "
        "cumulative corpus share — the vocabulary-concentration "
        "diagnostic run before choosing tokenizer/stopword policy. "
        "Counts come from one map-side-combined groupBy; the head is a "
        "TakeOrdered top-20 (no global sort), and only those 20 rows "
        "enter the cumulative window, so nothing here grows with corpus "
        "size except the token count aggregation itself."
    ),
)
def t23_zipf_token_curve(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(whitespace_tokens("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = toks.agg(F.count("*").cast("double").alias("total"))
    top = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.desc("n"), F.asc("tok")))
            .cast("long"),
        )
    )
    return (
        top.crossJoin(total)  # 20 x 1 — a literal-sized broadcast
        .withColumn(
            "cum_share",
            F.round(
                F.sum("n").over(W.orderBy("rank")).cast("double")
                / F.col("total"),
                6,
            ),
        )
        .select("rank", "tok", F.col("n").cast("long").alias("n"), "cum_share")
    )


@register(
    "t24_sentence_stats",
    r"""
    WITH s AS (
        SELECT lang,
               GREATEST(length(text)
                        - length(regexp_replace(text, '[.!?]', '', 'g')), 1)
                 AS n_sentences,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
               length(text) AS n_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(n_words) AS DOUBLE) / SUM(n_sentences), 6)
             AS words_per_sentence,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_words), 6)
             AS chars_per_word
    FROM s GROUP BY lang
    """,
    category="llm-text",
    doc=(
        "readability profile per language (the Flesch-style length "
        "ratios quality pipelines gate on): sentences counted by "
        "terminator characters, words by the shared whitespace "
        "tokenizer, ratios from integer sums so they are exact and "
        "order-independent. Pure per-row JVM expressions into one "
        "map-side-combined aggregation — zero extra shuffles at any "
        "scale."
    ),
)
def t24_sentence_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "lang",
        F.greatest(
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.!?]", "")),
            F.lit(1),
        ).alias("n_sentences"),
        F.size(whitespace_tokens("text")).alias("n_words"),
        F.length("text").alias("n_chars"),
    )
    return s.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(
            F.sum("n_words").cast("double") / F.sum("n_sentences"), 6
        ).alias("words_per_sentence"),
        F.round(F.sum("n_chars").cast("double") / F.sum("n_words"), 6).alias(
            "chars_per_word"
        ),
    )


@register(
    "a15_weighted_median",
    f"""
    WITH w AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS price,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cum,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_returnflag) AS tot
        FROM lineitem
    )
    SELECT l_returnflag,
           MIN(price) AS weighted_median,
           {sql_cast_double('MIN(tot)')} AS total_weight
    FROM w WHERE 2 * cum >= tot
    GROUP BY l_returnflag
    """,
    category="aggregation",
    doc=(
        "exact weighted median (price weighted by quantity) per return "
        "flag — the order statistic approx sketches cannot give you "
        "exactly. One hash exchange on the group key serves both the "
        "running and total weight windows (same partitioning); the "
        "qualifying-row scan is a filter, not a second shuffle. DECIMAL "
        "cumulative weights make the boundary row partition-order-"
        "independent; ties on price break on the unique line key."
    ),
)
def a15_weighted_median(spark, sf_dir):
    # shuffle only the three columns the median needs (r14, guide §2.3):
    # the cumulative sum previously ordered by (price, orderkey,
    # linenumber), dragging two 8-byte tie-breakers through the window
    # exchange. Ordering by price alone is result-identical: the filter
    # keeps every row from the threshold crossing onward and min(price)
    # is the crossing row's price, which is the same whichever order
    # equal-price rows accumulate in (the crossing lands inside the
    # equal-price run either way).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    cum_w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.sum(qty).over(cum_w).alias("cum"),
        F.sum(qty).over(W.partitionBy("l_returnflag")).alias("tot"),
    )
    return (
        w.filter(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.min("tot").cast("double").alias("total_weight"),
        )
    )


@register(
    "w17_rolling_median",
    """
    SELECT event_id, user_id, ts,
           ROUND(median(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS rolling_median
    FROM events
    """,
    category="window",
    doc=(
        "exact rolling median of each user's last 5 event values — the "
        "robust smoother (rolling mean is outlier-dominated; w16's MAD "
        "is its global cousin). No engine exposes median as a native "
        "sliding frame aggregate over arbitrary input, but a CONSTANT "
        "frame of k rows makes exactness cheap: collect_list over the "
        "5-row frame, sort_array, interpolate — per-row state is k "
        "values, one exchange on user_id, nothing grows with history. "
        "Interpolated even-count median matches DuckDB's quantile_cont."
    ),
)
def w17_rolling_median(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(
        F.collect_list(F.col("value").cast("double")).over(fr)
    )
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.when(n % 2 == 1, odd).otherwise(even), 6).alias(
            "rolling_median"
        ),
    )


@register(
    "j12_binned_range_join",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
    SELECT a.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CAST(SUM(b.us - a.us) AS BIGINT) // COUNT(*) AS BIGINT)
             AS avg_gap_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND b.us > a.us AND b.us <= a.us + 600000000
    GROUP BY a.user_id
    """,
    category="join",
    doc=(
        "range self-join made shuffle-shaped: pairs of same-user events "
        "within 10 minutes. The naive form is a non-equi theta join — "
        "O(n_u^2) comparisons per user and a BroadcastNestedLoop plan. "
        "Binning event times to the window width turns it into an "
        "EQUI-join: a row in (user, bin) can only pair forward with "
        "rows in bin or bin+1, so the probe side expands to exactly two "
        "bin keys and the exact range predicate filters the equi-join "
        "output. Cost drops from per-user-quadratic scans to hash-join "
        "work linear in true candidates — the standard interval-join "
        "recipe (Flink's interval join runs the same shape). "
        "test_plans.py gates the no-nested-loop property."
    ),
)
def j12_binned_range_join(spark, sf_dir):
    width_us = 600_000_000  # 10 minutes
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    binned = e.withColumn("bin", F.floor(F.col("us") / width_us))
    left = binned.select(
        "user_id",
        F.col("us").alias("a_us"),
        F.explode(
            F.array(F.col("bin"), F.col("bin") + 1)
        ).alias("probe_bin"),
    )
    right = binned.select(
        "user_id", F.col("us").alias("b_us"), F.col("bin").alias("probe_bin")
    )
    pairs = left.join(right, ["user_id", "probe_bin"]).filter(
        (F.col("b_us") > F.col("a_us"))
        & (F.col("b_us") <= F.col("a_us") + width_us)
    )
    # average gap as FLOOR µs via integer division: gaps are exact
    # integers, so no float rounding tie can ever split engines (a
    # DOUBLE avg rounded to 6 dp hash-mismatched at sf0.01 on an exact
    # .5e-6 boundary — found by the driver contract, not pytest)
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("b_us") - F.col("a_us")).cast("long").alias("_sum_us"),
        )
        .select(
            "user_id",
            "n_pairs",
            F.expr("CAST(_sum_us div n_pairs AS BIGINT)").alias("avg_gap_us"),
        )
    )


@register(
    "v10_matryoshka_audit",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    s64 AS (
        SELECT query_id, neighbor_id, rn FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qv, e.v)
                             / (sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(e.v, e.v))), 6) DESC,
                       e.vec_id ASC) AS BIGINT) AS rn
            FROM q JOIN e ON q.query_id <> e.vec_id)
        WHERE rn <= 5
    ),
    s16 AS (
        SELECT query_id, neighbor_id, rn FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qv[1:16], e.v[1:16])
                             / (sqrt(list_dot_product(q.qv[1:16], q.qv[1:16]))
                                * sqrt(list_dot_product(e.v[1:16], e.v[1:16]))), 6) DESC,
                       e.vec_id ASC) AS BIGINT) AS rn
            FROM q JOIN e ON q.query_id <> e.vec_id)
        WHERE rn <= 5
    )
    SELECT s64.query_id,
           CAST(COUNT(s16.neighbor_id) AS BIGINT) AS preserved_at_5
    FROM s64 LEFT JOIN s16
      ON s64.query_id = s16.query_id AND s64.neighbor_id = s16.neighbor_id
    GROUP BY s64.query_id
    """,
    category="llm-similarity",
    doc=(
        "matryoshka truncation audit (Kusupati et al. 2022, public): "
        "how many of each query's exact top-5 at full 64 dims survive "
        "when vectors are truncated to the 16-dim prefix — the "
        "measurement behind serving embeddings at reduced dimension. "
        "Two exact_topk passes (the 16-dim one over F.slice'd vectors, "
        "projected before the ranking shuffle like v01) and a top-5 x "
        "top-5 key join; at 100 TB both passes are the v01 broadcast "
        "shape and the audit join is 5 rows per query."
    ),
)
def v10_matryoshka_audit(spark, sf_dir):
    from ..sources import spread_scan

    # spread_scan: both exact-topk corpus passes ran single-task over
    # the single-row-group scan (r13 profile discipline). KEPT by the
    # r14 clean A/B (VERDICT r13 item 4): in probe-quiet windows the
    # spread wins (0.98/1.19 s vs 1.32-1.75 s without); noisy-window
    # runs invert only because contention inflates the added exchange.
    e = spread_scan(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    full = exact_topk(e, q, "vec_id", "v", k=5)
    e16 = e.select("vec_id", F.slice("v", 1, 16).alias("v"))
    q16 = e16.filter(F.col("vec_id") < 20)
    trunc = exact_topk(e16, q16, "vec_id", "v", k=5).select(
        "query_id", F.col("neighbor_id").alias("t_neighbor")
    )
    return (
        full.select("query_id", "neighbor_id")
        .join(
            trunc,
            (full.query_id == trunc.query_id)
            & (full.neighbor_id == trunc.t_neighbor),
            "left",
        )
        .drop(trunc.query_id)
        .groupBy("query_id")
        .agg(F.count("t_neighbor").cast("long").alias("preserved_at_5"))
    )


@register(
    "io18_parquet_codec_roundtrip",
    f"""
    WITH agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               {sql_dsum('o_totalprice')}
                 AS total_price
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT codec, n_rows, total_price
    FROM (VALUES ('gzip'), ('snappy'), ('zstd')) c(codec), agg
    """,
    category="sources",
    doc=(
        "compression-codec roundtrip: the same orders slice written as "
        "snappy, gzip and zstd parquet, each read back and aggregated — "
        "identical results prove codec choice is a pure "
        "storage/CPU trade with zero semantic surface (the decision "
        "100 TB lakes tune constantly: zstd for cold data, snappy for "
        "hot). Write parallelism is the DataFrame's partitioning; reads "
        "split by row group exactly like any parquet scan."
    ),
)
def io18_parquet_codec_roundtrip(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    )
    root = scratch_dir(prefix="dlw_codec_")
    outs = []
    for codec in ("gzip", "snappy", "zstd"):
        path = os.path.join(root, codec)
        o.write.mode("overwrite").option("compression", codec).parquet(path)
        outs.append(
            spark.read.parquet(path).agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_price"),
            ).select(F.lit(codec).alias("codec"), "n_rows", "total_price")
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


@register(
    "io19_schema_drift_audit",
    """
    SELECT * FROM (VALUES
        ('o_orderdate',     'added',        CAST(NULL AS VARCHAR), 'timestamp'),
        ('o_orderpriority', 'removed',      'string',              CAST(NULL AS VARCHAR)),
        ('o_totalprice',    'type_changed', 'double',              'decimal(18,2)')
    ) t(column_name, change, old_type, new_type)
    """,
    category="sources",
    doc=(
        "schema drift audit between two table snapshots (the evolution "
        "governance check run before enabling mergeSchema or a CDC "
        "apply): column sets and types from both parquet footers are "
        "diffed relationally into added / removed / type_changed rows. "
        "Schema extraction is footer metadata — no data scanned at any "
        "table size; the planted drift (one add, one drop, one type "
        "change against an orders projection) makes the diff "
        "deterministic and oracle-checkable."
    ),
)
def io19_schema_drift_audit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    root = scratch_dir(prefix="dlw_drift_")
    v1, v2 = os.path.join(root, "v1"), os.path.join(root, "v2")
    o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).limit(100).write.parquet(v1)
    o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        "o_orderdate",
    ).limit(100).write.parquet(v2)
    old = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v1).schema}
    new = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v2).schema}
    a = spark.createDataFrame(
        [(k, v) for k, v in old.items()], "column_name string, old_type string"
    )
    b = spark.createDataFrame(
        [(k, v) for k, v in new.items()], "column_name string, new_type string"
    )
    return (
        a.join(b, "column_name", "full_outer")
        .select(
            "column_name",
            F.when(F.col("old_type").isNull(), F.lit("added"))
            .when(F.col("new_type").isNull(), F.lit("removed"))
            .when(F.col("old_type") != F.col("new_type"), F.lit("type_changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
            "old_type",
            "new_type",
        )
        .filter(F.col("change") != "unchanged")
    )


@register(
    "t26_dedup_aware_token_count",
    r"""
    WITH per_doc AS (
        SELECT lang, text,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n
        FROM documents
    ),
    tot AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM per_doc GROUP BY lang
    ),
    ded AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS dedup_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_unique_docs
        FROM (SELECT lang, text, MAX(n) AS n FROM per_doc GROUP BY lang, text)
        GROUP BY lang
    )
    SELECT tot.lang, total_tokens, dedup_tokens, n_docs, n_unique_docs,
           ROUND(CAST(dedup_tokens AS DOUBLE) / total_tokens, 6)
             AS effective_ratio
    FROM tot JOIN ded ON tot.lang = ded.lang
    """,
    category="llm-text",
    doc=(
        "effective-token accounting (the first number a training-mix "
        "plan needs): per language, raw token count vs tokens surviving "
        "exact dedup — byte-identical copies contribute once. Grouping "
        "on (lang, text) collapses duplicates in ONE map-side-combined "
        "aggregation keyed by the text (at 100 TB swap the key for "
        "sha2(text) — same plan, 64-byte keys); the ratio quantifies "
        "how much of the corpus is duplicated mass before any near-dup "
        "work is spent."
    ),
)
def t26_dedup_aware_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        "text",
        F.size(whitespace_tokens("text")).cast("long").alias("n"),
    )
    tot = per_doc.groupBy("lang").agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_docs"),
    )
    ded = (
        per_doc.groupBy("lang", "text")
        .agg(F.max("n").alias("n"))
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("dedup_tokens"),
            F.count("*").cast("long").alias("n_unique_docs"),
        )
    )
    return tot.join(ded, "lang").select(
        "lang",
        "total_tokens",
        "dedup_tokens",
        "n_docs",
        "n_unique_docs",
        F.round(
            F.col("dedup_tokens").cast("double") / F.col("total_tokens"), 6
        ).alias("effective_ratio"),
    )


# ---------------------------------------------------------------------------
# Late round-7 additions: interval analytics (sweep-line concurrency and
# interval-overlap join). Transit intervals are DERIVED deterministically
# from real columns (duration = 1 + quantity % 14 days) because this
# table trim carries no receipt date; the derivation is mirrored
# verbatim in the oracles.

_W18_EPOCH = "1995-01-01"

# 28 audit windows, 21 days each, every 90 days from 1995-02-10 —
# deliberately NOT aligned to the 32-day join bins so the bin join
# cannot degenerate into pure equality.
_X08_WINDOWS = [
    (i, f"DATE '1995-02-10' + INTERVAL {90 * i} DAY") for i in range(28)
]


@register(
    "w18_max_concurrent_intervals",
    """
    WITH li AS (
        SELECT l_suppkey,
               CAST(l_shipdate AS DATE) AS lo,
               CAST(l_shipdate AS DATE)
                 + (1 + CAST(l_quantity AS INT) % 14) * INTERVAL 1 DAY AS hi
        FROM lineitem
    ),
    pts AS (
        SELECT l_suppkey, lo AS d, 1 AS delta FROM li
        UNION ALL
        SELECT l_suppkey, hi AS d, -1 AS delta FROM li
    ),
    run AS (
        SELECT l_suppkey,
               SUM(delta) OVER (PARTITION BY l_suppkey ORDER BY d, delta) AS conc
        FROM pts
    )
    SELECT l_suppkey, CAST(MAX(conc) AS BIGINT) AS max_in_transit
    FROM run GROUP BY l_suppkey
    """,
    category="window",
    doc=(
        "sweep-line maximum concurrency: how many of a supplier's "
        "shipments are in transit at once (transit = [shipdate, "
        "shipdate + 1 + quantity % 14 days), half-open). Each interval "
        "contributes a +1 point at its start and a -1 at its end; the "
        "running sum over (date, delta) is the live-interval count and "
        "its max is the peak. Ordering deltas ascending puts same-day "
        "ends BEFORE same-day starts (half-open semantics), and the "
        "default RANGE frame makes every tie-group row carry the "
        "group-total prefix sum, so per-row values are fully "
        "deterministic under any shuffle order. One shuffle on the "
        "partition key; state per group is O(1) — the classic "
        "interval-scheduling shape that survives any scale. Same sweep "
        "as the reference would need for concurrent-lease accounting "
        "(src/lib.rs pin/lease lifecycle)."
    ),
)
def w18_max_concurrent_intervals(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("lo"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            1 + F.col("l_quantity").cast("int") % 14,
        ).alias("hi"),
    )
    return max_concurrent_intervals(li, "l_suppkey", "lo", "hi").select(
        "l_suppkey", F.col("max_concurrent").alias("max_in_transit")
    )


def max_concurrent_intervals(
    df: "DataFrame", key: str, lo: str, hi: str
) -> "DataFrame":
    """(key, max_concurrent): peak count of simultaneously-live
    half-open [lo, hi) intervals per key — the w18 sweep line, reusable
    over any interval set."""
    pts = df.select(
        key, F.col(lo).alias("d"), F.lit(1).alias("delta")
    ).unionAll(df.select(key, F.col(hi).alias("d"), F.lit(-1).alias("delta")))
    run = pts.select(
        key,
        F.sum("delta").over(W.partitionBy(key).orderBy("d", "delta")).alias(
            "conc"
        ),
    )
    return run.groupBy(key).agg(
        F.max("conc").cast("long").alias("max_concurrent")
    )


@register(
    "x08_interval_overlap_join",
    f"""
    WITH li AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               CAST(l_shipdate AS DATE) AS lo,
               CAST(l_shipdate AS DATE)
                 + (1 + CAST(l_quantity AS INT) % 14) * INTERVAL 1 DAY AS hi
        FROM lineitem
    ),
    win(window_id, w_lo) AS (
        VALUES {", ".join(f"({i}, {expr})" for i, expr in _X08_WINDOWS)}
    ),
    w2 AS (SELECT window_id, w_lo, w_lo + INTERVAL 21 DAY AS w_hi FROM win)
    SELECT window_id, CAST(w_lo AS DATE) AS w_start,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice')}
             AS revenue
    FROM li JOIN w2 ON li.lo < w2.w_hi AND w2.w_lo < li.hi
    GROUP BY window_id, w_lo
    """,
    category="asof-range",
    doc=(
        "interval x interval OVERLAP join (audit windows vs in-transit "
        "spans), executed as a BINNED EQUI-JOIN: both sides explode "
        "into the 32-day bins they span (every interval here is shorter "
        "than one bin, so at most 2 bins each), candidates meet on the "
        "bin key, the exact half-open overlap predicate filters, and a "
        "pair is COUNTED ONLY in the bin of max(lo_a, lo_w) — the first "
        "bin of the overlap region — which dedupes multi-bin matches "
        "with pure arithmetic instead of a distinct. x05 is the "
        "point-in-interval broadcast shape; this is the both-sides-"
        "large recipe (Flink/SparkSQL interval-join style): shuffle "
        "bounded by bins-spanned x rows, no BroadcastNestedLoop, no "
        "quadratic corner. The window dim is tiny here so Spark still "
        "broadcasts it — same plan, zero fact-side shuffle before the "
        "aggregate."
    ),
)
def x08_interval_overlap_join(spark, sf_dir):
    import datetime

    bin_days = 32
    epoch = F.lit(_W18_EPOCH).cast("date")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        F.col("l_shipdate").cast("date").alias("lo"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            1 + F.col("l_quantity").cast("int") % 14,
        ).alias("hi"),
    )
    base = datetime.date(1995, 2, 10)
    wins = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=90 * i))
            for i in range(len(_X08_WINDOWS))
        ],
        "window_id int, w_lo date",
    ).select("window_id", "w_lo", F.date_add("w_lo", 21).alias("w_hi"))

    pairs = interval_overlap_join(
        li, wins.select("window_id", F.col("w_lo").alias("lo"),
                        F.col("w_hi").alias("hi")),
        bin_days=bin_days, epoch=_W18_EPOCH, broadcast_right=True,
    )
    return pairs.groupBy("window_id", F.col("r_lo").alias("w_start")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def interval_overlap_join(
    left: "DataFrame",
    right: "DataFrame",
    bin_days: int = 32,
    epoch: str = _W18_EPOCH,
    broadcast_right: bool = False,
) -> "DataFrame":
    """Binned interval x interval overlap equi-join (the x08 recipe,
    reusable). Both inputs carry half-open [lo, hi) DATE columns named
    lo/hi; every other column passes through (right's lo/hi surface as
    r_lo/r_hi). Each side explodes into the ``bin_days``-day bins it
    spans, candidates meet on the bin key, the exact overlap predicate
    filters, and a pair survives ONLY in the bin of max(lo, r_lo) — the
    first bin of the overlap region — so multi-bin matches dedupe by
    arithmetic, not a distinct. Shuffle volume is rows x bins-spanned;
    no BroadcastNestedLoop, no quadratic corner, both sides may be
    arbitrarily large (set ``broadcast_right`` when the right side is a
    small dim)."""
    ep = F.lit(epoch).cast("date")

    def days(c):
        return F.datediff(c, ep)

    def bins(lo, hi):
        # half-open [lo, hi): the last covered day is hi-1
        return F.sequence(
            F.floor(days(lo) / bin_days), F.floor((days(hi) - 1) / bin_days)
        )

    lb = left.select(
        "*", F.explode(bins(F.col("lo"), F.col("hi"))).alias("bin")
    )
    rb = right.select(
        *[F.col(c).alias(f"r_{c}" if c in ("lo", "hi") else c)
          for c in right.columns],
        F.explode(bins(F.col("lo"), F.col("hi"))).alias("bin"),
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    return (
        lb.join(rb, "bin")
        .filter((F.col("lo") < F.col("r_hi")) & (F.col("r_lo") < F.col("hi")))
        .filter(
            F.col("bin")
            == F.floor(days(F.greatest(F.col("lo"), F.col("r_lo"))) / bin_days)
        )
        .drop("bin")
    )


@register(
    "io20_data_quality_audit",
    """
    WITH pk AS (
        SELECT 'pk_unique_o_orderkey' AS check_name, 'orders' AS tbl,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders
    ),
    fk AS (
        SELECT 'fk_orders_customer' AS check_name, 'orders' AS tbl,
               CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
                 AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    nn AS (
        SELECT 'not_null_l_shipdate' AS check_name, 'lineitem' AS tbl,
               CAST(COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT)
                 AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
    ),
    rng AS (
        SELECT 'range_l_quantity_1_50' AS check_name, 'lineitem' AS tbl,
               CAST(COUNT(*) FILTER (
                   WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
                 AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
    ),
    enm AS (
        SELECT 'enum_l_returnflag' AS check_name, 'lineitem' AS tbl,
               CAST(COUNT(*) FILTER (
                   WHERE l_returnflag NOT IN ('A','N','R')) AS BIGINT)
                 AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
    )
    SELECT check_name, tbl, n_bad, n_rows, n_bad = 0 AS ok FROM (
        SELECT * FROM pk UNION ALL SELECT * FROM fk UNION ALL
        SELECT * FROM nn UNION ALL SELECT * FROM rng UNION ALL
        SELECT * FROM enm)
    """,
    category="io-lake",
    doc=(
        "declarative data-quality audit (the Deequ/Great-Expectations "
        "constraint-suite shape): PK uniqueness, FK referential "
        "integrity, not-null, numeric range, and enum membership, each "
        "reduced to a violation COUNT so every check is one map-side-"
        "combined aggregate — conditional sums, no row-level "
        "materialization. The FK check is the only join: orders LEFT "
        "JOIN customer on the key, unmatched rows counted; Spark "
        "broadcasts the dim side. Output is one row per check, so the "
        "audit costs a handful of scans regardless of table size — at "
        "100 TB each check is a single pass that AQE can run off the "
        "same shuffle-free plan."
    ),
)
def io20_data_quality_audit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem")

    def one(check, tbl, df, bad):
        return df.agg(
            F.lit(check).alias("check_name"),
            F.lit(tbl).alias("tbl"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
            F.count("*").cast("long").alias("n_rows"),
        )

    pk = o.agg(
        F.lit("pk_unique_o_orderkey").alias("check_name"),
        F.lit("orders").alias("tbl"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey")))
        .cast("long")
        .alias("n_bad"),
        F.count("*").cast("long").alias("n_rows"),
    )
    fk = one(
        "fk_orders_customer",
        "orders",
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left"),
        F.col("c_custkey").isNull(),
    )
    nn = one(
        "not_null_l_shipdate", "lineitem", li, F.col("l_shipdate").isNull()
    )
    rng = one(
        "range_l_quantity_1_50",
        "lineitem",
        li,
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
    )
    enm = one(
        "enum_l_returnflag",
        "lineitem",
        li,
        ~F.col("l_returnflag").isin("A", "N", "R"),
    )
    return (
        pk.unionAll(fk)
        .unionAll(nn)
        .unionAll(rng)
        .unionAll(enm)
        .withColumn("ok", F.col("n_bad") == 0)
    )
