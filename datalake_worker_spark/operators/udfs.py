"""Pandas-UDF surface (SURVEY.md §2.2 "UDF surface"): scalar pandas UDF,
grouped-map ``applyInPandas``, grouped-agg pandas UDF.

These exist to prove the Arrow-vectorized Python path — the semantics
chosen here are deliberately SQL-expressible so the DuckDB oracle can
verify the plumbing end-to-end. Real workloads put the non-SQL logic
(model scoring, tokenizers) in these hooks; the batch shape is identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..sources import load_table


@register(
    "p01_scalar_pandas_udf",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price
    FROM lineitem
    WHERE l_quantity >= 30
    """,
    doc="scalar pandas UDF (Arrow-vectorized): net price per line item.",
)
def p01_scalar_pandas_udf(spark, sf_dir):
    @pandas_udf("double")
    def net_price(
        price: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        # no .round(2) here: pandas rounds half-even, SQL engines round
        # half-away — 6 dp is boundary-free for 2-dp input products
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net_price("l_extendedprice", "l_discount", "l_tax"), 6).alias("net_price"),
    )


@register(
    "p02_grouped_map_pandas",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice
                 - SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER w
                   / (100.0 * COUNT(*) OVER w), 6) AS price_dev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    """,
    doc=(
        "applyInPandas grouped-map: per-customer mean-centering of order "
        "price, batched by hash bucket (the many-small-groups pattern)."
    ),
)
def p02_grouped_map_pandas(spark, sf_dir):
    """Grouped-map over hash BUCKETS of customers, not single customers:
    applyInPandas invokes Python once per group, so grouping directly on
    a high-cardinality key pays per-call overhead on thousands of tiny
    frames (22 s for 150k rows / ~10k customers at sf0.1). Bucketing the
    key into 64 groups amortizes the calls and vectorizes the
    per-customer math with pandas groupby inside each batch (~2 s) —
    the shape that survives a 100 TB key space."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        # mean via exact integer-cents sum: float summation is
        # order-dependent and Spark hands the group over in partition
        # order — int64 cents make both engines' means bit-identical
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        g = cents.groupby(pdf["o_custkey"].to_numpy())
        mean = g.transform("sum") / (100.0 * g.transform("count"))
        out["price_dev"] = (pdf["o_totalprice"] - mean).round(6)
        return out

    # project before the grouped-map shuffle: applyInPandas ships whole
    # rows through Arrow, so unused columns cost transfer on every row
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy(
        F.pmod(F.hash("o_custkey"), F.lit(64)).alias("_bkt")
    ).applyInPandas(center, "o_custkey long, o_orderkey long, price_dev double")


@register(
    "p03_grouped_agg_pandas",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="grouped-agg pandas UDF: quantity-weighted average price.",
)
def p03_grouped_agg_pandas(spark, sf_dir):
    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@register(
    "p04_python_udtf",
    """
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS token,
           CAST(length(unnest(string_split(text, ' '))) AS INTEGER) AS token_len
    FROM documents
    WHERE doc_id < 20
    """,
    category="pandas-udf",
    doc=(
        "Python UDTF (table function, SQL LATERAL): one input row fans "
        "out to one row per token with position and length — the "
        "user-extensible analog of posexplode for logic a builtin can't "
        "express (parsers, tokenizers, segmenters). Runs per-partition "
        "in the Python worker, no shuffle; prefer mapInPandas/explode "
        "when the expansion IS expressible (s05/s06) — the UDTF is the "
        "API-surface escape hatch, demonstrated here against the "
        "equivalent relational oracle."
    ),
)
def p04_python_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("dlw_split_tokens", SplitTokens)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("dlw_p04_docs")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token, t.token_len
        FROM dlw_p04_docs, LATERAL dlw_split_tokens(text) t
        """
    )


@register(
    "w09_ewma_smoothing",
    """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), r AS (
        SELECT user_id, event_id, rn, value AS ewma FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn, 0.25 * s.value + 0.75 * r.ewma
        FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, ewma FROM r
    """,
    category="window",
    doc=(
        "per-key exponential moving average (the sequential recurrence "
        "no SQL window frame expresses): one grouped-map pandas pass per "
        "user, events sorted by (ts, event_id), e_n = a*v_n + (1-a)*e_(n-1) "
        "with a=0.25. One shuffle on the key, state is a single float per "
        "group — the batch twin of the applyInPandasWithState streaming "
        "op (st06). The identical operation order on both sides makes "
        "the doubles bit-reproducible, so the oracle (a recursive CTE) "
        "hash-matches without rounding."
    ),
)
def w09_ewma_smoothing(spark, sf_dir):
    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # adjust=False is exactly e_n = a*v_n + (1-a)*e_{n-1} — the same
        # operation order as the oracle's recursion, vectorized in C
        out = pdf["value"].ewm(alpha=0.25, adjust=False).mean()
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ewma": out}
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return ev.groupBy("user_id").applyInPandas(
        ewma, "user_id bigint, event_id bigint, ewma double"
    )


@register(
    "p05_map_in_arrow",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 251 AS BIGINT) AS byte_mod
    FROM documents
    """,
    category="pandas-udf",
    doc=(
        "mapInArrow: the zero-copy Arrow-batch API (the fourth Python "
        "execution surface next to scalar/grouped pandas UDFs and "
        "UDTFs) — the whole RecordBatch arrives as pyarrow with NO "
        "pandas conversion, the right seam for columnar-native Python "
        "(tokenizers binding Arrow buffers, FAISS, polars). Computes "
        "utf-8 byte lengths per document from the Arrow buffer "
        "directly; partition-local, zero shuffle, oracle-exact "
        "integers."
    ),
)
def p05_map_in_arrow(spark, sf_dir):
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            tbl = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pa.compute.binary_length(
                        pa.compute.cast(batch.column("text"), pa.binary())
                    ).cast(pa.int64()),
                }
            )
            tbl = tbl.append_column(
                "byte_mod",
                pa.compute.cast(
                    pa.compute.subtract(
                        tbl.column("n_bytes"),
                        pa.compute.multiply(
                            pa.compute.floor(
                                pa.compute.divide(
                                    pa.compute.cast(tbl.column("n_bytes"), pa.float64()),
                                    251.0,
                                )
                            ).cast(pa.int64()),
                            251,
                        ),
                    ),
                    pa.int64(),
                ),
            )
            for out in tbl.to_batches():
                yield out

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(fn, "doc_id long, n_bytes long, byte_mod long")
