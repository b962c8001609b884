"""TF-IDF and lexicon-join scoring (SURVEY.md §2.2 "text analysis";
the sentiment-lexicon join follows the Spark pattern described in the
EDBT'16 reference of PAPERS.md — tokenize, join against a scored
lexicon, aggregate per document)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .text import explode_tokens

# tiny deterministic sentiment lexicon over the synthetic vocabulary
LEXICON = [
    ("fast", 2.0),
    ("big", 1.0),
    ("small", -0.5),
    ("slow", -2.0),
    ("error", -3.0),
    ("merge", 0.5),
    ("scan", 0.25),
]


def _lexicon_values_sql() -> str:
    return ", ".join(f"('{w}', {s})" for w, s in LEXICON)


@register(
    "t06_tfidf_top_terms",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS BIGINT) AS rn
        FROM scored)
    WHERE rn <= 3
    """,
    category="llm-text",
    doc="tf-idf: term frequency × ln(N/df), top-3 terms per document.",
)
def t06_tfidf_top_terms(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = explode_tokens(d)
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # N as a broadcast 1-row corpus total (t10's pattern) — a driver-side
    # d.count() here would add a second full scan of documents
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
    )


@register(
    "t10_unigram_logprob",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY tok
    ),
    total AS (SELECT CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n FROM freq),
    scored AS (
        SELECT t.doc_id,
               CAST(ROUND(-LN(f.c / total.n), 6) AS DECIMAL(18,6)) AS nll
        FROM tok t JOIN freq f USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(nll) AS DOUBLE) AS total_nll,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM scored
    GROUP BY doc_id
    """,
    category="llm-text",
    doc=(
        "unigram LM scoring: corpus token probabilities → per-doc negative "
        "log-likelihood (the standard perplexity-style quality filter). "
        "Per-token -ln p is rounded to 6 dp and summed as DECIMAL so the "
        "aggregate is order-independent and cross-engine exact."
    ),
)
def t10_unigram_logprob(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = explode_tokens(d)
    freq = tok.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    total = freq.agg(F.sum(F.col("c").cast("long")).cast("double").alias("n"))
    scored = (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(-F.log(F.col("c") / F.col("n")), 6)
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("nll").cast("double").alias("total_nll"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_nll"),
    )


@register(
    "t07_sentiment_lexicon",
    rf"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    lex AS (SELECT * FROM (VALUES {_lexicon_values_sql()}) t(tok, score))
    SELECT t.doc_id,
           CAST(COUNT(l.score) AS BIGINT) AS n_scored_tokens,
           ROUND(CAST(SUM(CAST(COALESCE(l.score, 0) AS DECIMAL(10,2))) AS DOUBLE), 6)
             AS sentiment
    FROM tok t LEFT JOIN lex l ON t.tok = l.tok
    GROUP BY t.doc_id
    """,
    category="llm-text",
    doc="lexicon sentiment: tokenize → broadcast-join scored lexicon → per-doc sum.",
)
def t07_sentiment_lexicon(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(LEXICON, "tok string, score double")
    tok = explode_tokens(d)
    return (
        tok.join(F.broadcast(lex), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("score").alias("n_scored_tokens"),
            F.round(
                F.sum(F.coalesce(F.col("score"), F.lit(0.0)).cast("decimal(10,2)")).cast(
                    "double"
                ),
                6,
            ).alias("sentiment"),
        )
    )
