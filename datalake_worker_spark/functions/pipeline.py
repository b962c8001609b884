"""Corpus-level cleaning operators for LLM training-data pipelines
(SURVEY.md §2.2 "LLM-pipeline extensions"): C4-style cross-document
segment dedup, benchmark n-gram decontamination, deterministic
train/val/test splitting, and mergeable-sketch (HLL) distinct rollups.

All hot paths are JVM-side expressions; every aggregation is two-phase
(map-side partial). Wide dependencies key on hashed segment/gram text —
hashing uniformizes VALUES but not MULTIPLICITIES (boilerplate segments
and grams are Zipfian-hot in real corpora), so the aggregates absorb
hot keys map-side and the join-backs are salted or broadcast (r9 skew
audit; SCALE.md)."""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table, spread_scan
from .text import whitespace_tokens

# ---------------------------------------------------------------------------
# building blocks (engine API, reusable on any DataFrame)
# ---------------------------------------------------------------------------


def text_segments(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 10
) -> DataFrame:
    """Explode documents into consecutive ``seg_words``-word segments.

    Returns (id, pos, seg): the "line" unit for cross-document segment
    dedup (C4 uses real lines; this corpus has none, so fixed word spans
    are the unit — same plan shape either way). One narrow projection +
    one explode; words are materialized once per row before slicing
    (repeated split() re-evaluation is the known 10× trap)."""
    w = df.select(
        F.col(id_col), whitespace_tokens(text_col).alias("_words")
    )
    nseg = F.greatest(
        F.ceil(F.size("_words") / F.lit(float(seg_words))), F.lit(1)
    ).cast("int")
    return w.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("_words"), i * seg_words + 1, seg_words)
                ),
            )
        ).alias("pos", "seg"),
    )


def segment_dedup(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 10
) -> DataFrame:
    """Drop segments whose exact text occurs in more than one document,
    rebuilding each document from its surviving segments (C4's
    three-sentence-span rule, re-expressed over fixed word spans).

    Scale shape: the duplicate set is found by a two-phase aggregate on
    sha2(seg) — O(1) state per key, safe under a segment duplicated
    millions of times (a window-based min!=max flag would funnel every
    occurrence of a hot segment through one task; the common case in web
    corpora is exactly such boilerplate) — then joined back onto the
    segment rows as a small (dup-keys-only) build side. The segment
    explode runs once per branch (two corpus scans): a deliberate trade —
    sharing the exploded rows would need an exchange of ALL segment text,
    and re-scanning columnar parquet is cheaper than shuffling the same
    bytes (ReuseExchange cannot dedupe the branches anyway: the partial
    aggregate sits below the dup branch's exchange). The flag join back
    onto the segment rows is SALTED (r9): a boilerplate segment shared
    by 30% of documents is a genuinely hot probe key, and AQE's skew
    split structurally cannot fix this join — the count-distinct
    aggregate sits between the build side's shuffle and sort, so
    OptimizeSkewedJoin's SMJ(Sort(stage), Sort(stage)) pattern never
    matches (measured live in the t27 r9 probe). Salting spreads each
    hot key over 8 reducers for an 8x replication of the
    dup-keys-only build side (each dup key has >= 2 probe rows, so the
    replication is bounded by ~4x the probe's dup rows; when the dup
    set is small AQE still upgrades to broadcast and the salt is
    harmless). The rebuild is a single groupBy(id) with an in-group
    sort of ≤ a few hundred struct elements per doc."""
    from ..operators.skew import salted_join

    seg = text_segments(df, id_col, text_col, seg_words).withColumn(
        "_k", F.sha2(F.col("seg"), 256)
    )
    dup = (
        seg.groupBy("_k")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("_k", F.lit(True).alias("_dup"))
    )
    flagged = salted_join(seg, dup, "_k", salt_buckets=8, how="left").select(
        F.col(id_col),
        "pos",
        "seg",
        F.coalesce(F.col("_dup"), F.lit(False)).alias("_dup"),
    )
    kept = F.when(~F.col("_dup"), F.col("seg"))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("_dup").cast("long")).alias("n_dropped"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), kept.alias("_s")))
                        ),
                        lambda s: s.getField("_s"),
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("cleaned_text"),
        )
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with a benchmark
    set (test-set decontamination, the standard n-gram-overlap rule).

    Returns (id, n_matched) for contaminated documents. Both sides
    explode to distinct grams; the benchmark side is DISTINCT-collapsed
    before the equi-join on gram, so the join input is the benchmark's
    vocabulary — fixed-size by construction (a benchmark suite does not
    grow with the corpus), hence EXPLICITLY broadcast (r9; the d17
    argument): corpus grams then never shuffle, which also removes the
    Zipfian-gram hot-key hazard a shuffled gram join would have (a
    boilerplate gram in 30% of docs is a hot key AQE cannot split when
    the build side aggregates above its shuffle — the t27 probe)."""
    from .dedup import shingles_from_words

    def grams(df: DataFrame) -> DataFrame:
        # grams as xxhash64 longs: the (doc, gram) explode is the widest
        # stage — 8-byte join keys instead of n-word strings; match
        # counts are unchanged (injective up to 2^-64 collisions).
        # spread_scan: the explode is CPU-bound per row — parallelize a
        # sub-core-count (unsplittable single-file) scan first; no-op at
        # scale where file count provides parallelism
        return spread_scan(df, id_col).select(
            F.col(id_col),
            F.explode(
                shingles_from_words(whitespace_tokens(text_col), n)
            ).alias("_g"),
        ).select(id_col, F.xxhash64("_g").alias("gram")).distinct()

    bench_grams = grams(benchmark).select("gram").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )


#: PII patterns written to the common subset of Java regex (Spark) and
#: RE2 (DuckDB): character classes, bounded repetition, \b — no
#: lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,3}-\d{2,4}-\d{3,4}(-\d{3,4})?",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_redact(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Replace emails, phone numbers, and IPv4 addresses in ``text_col``
    with ``<EMAIL>`` / ``<PHONE>`` / ``<IP>`` tokens and count each kind
    (standard pre-training scrub). Pure per-row JVM regex expressions —
    zero shuffles, trivially parallel at any scale. Redaction order
    (email → phone → ip) is fixed so counts are unambiguous when
    patterns could nest."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
    red = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.select(
        *id_cols,
        red.alias("redacted_text"),
        *[F.col(f"n_{k}").cast("long").alias(f"n_{k}") for k in PII_PATTERNS],
    )


#: Planting expression for t15, shared by both engines: append one email,
#: one phone number, and one IPv4 address derived from doc_id so the
#: redaction is verifiable cross-engine on a corpus that has no real PII.
_T15_PLANT_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
)

_T15_SQL = f"""
    WITH planted AS (
        SELECT doc_id, {_T15_PLANT_SQL} AS text FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '{PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
               '{PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
             '{PII_PATTERNS["ip"]}', '<IP>', 'g') AS redacted_text,
           CAST(len(regexp_extract_all(text, '{PII_PATTERNS["email"]}'))
                AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}'))
                AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{PII_PATTERNS["ip"]}'))
                AS BIGINT) AS n_ip
    FROM planted
"""


def hash_split(
    df: DataFrame, id_col: str, train_max: str = "b", val_max: str = "d"
) -> Column:
    """Deterministic train/val/test assignment from the first hex char of
    sha256(id): '0'-'b' → train (12/16), 'c'-'d' → val, 'e'-'f' → test.

    Pure per-row expression — no shuffle, no RNG, stable under
    repartitioning and re-runs, and any engine with sha256 reproduces
    the identical assignment (the property that matters: a re-ingest
    must never migrate a document across splits)."""
    h = F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 1)
    return (
        F.when(h <= train_max, F.lit("train"))
        .when(h <= val_max, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


@register(
    "t14_segment_dedup",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    seg AS (
        SELECT doc_id, i AS pos,
               array_to_string(words[(i*10+1):(i*10+10)], ' ') AS seg
        FROM w, UNNEST(range(CAST(ceil(len(words)/10.0) AS BIGINT))) AS t(i)
    ),
    dup AS (
        SELECT seg FROM seg GROUP BY seg HAVING COUNT(DISTINCT doc_id) > 1
    ),
    f AS (
        SELECT s.doc_id, s.pos, s.seg, (d.seg IS NOT NULL) AS is_dup
        FROM seg s LEFT JOIN dup d ON s.seg = d.seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           COALESCE(
               string_agg(CASE WHEN NOT is_dup THEN seg END, ' ' ORDER BY pos),
               '') AS cleaned_text
    FROM f GROUP BY doc_id
    """,
    category="llm-pipeline",
    doc=(
        "C4-style cross-document segment dedup: 10-word spans occurring "
        "in >1 document are dropped and documents are rebuilt from the "
        "surviving spans. Two hash-keyed shuffles (count, flag-join) + "
        "one groupBy rebuild; no collect, no UDFs."
    ),
)
def t14_segment_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return segment_dedup(d, "doc_id", "text", seg_words=10)


@register(
    "d09_benchmark_decontamination",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(words) < 5 THEN [array_to_string(words, ' ')]
                    ELSE [array_to_string(words[(i+1):(i+5)], ' ')
                          for i in range(len(words)-4)] END AS grams
        FROM w
    ),
    bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
    cg AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g
           WHERE doc_id % 20 <> 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
    FROM cg JOIN bg USING (gram)
    GROUP BY doc_id
    """,
    category="llm-pipeline",
    doc=(
        "test-set decontamination by word 5-gram overlap: documents "
        "sharing any 5-gram with the benchmark subset (doc_id % 20 = 0 "
        "stands in for the held-out eval set) are flagged with their "
        "distinct-gram match count. Benchmark vocabulary is DISTINCT-"
        "collapsed before the gram join, so AQE broadcasts it."
    ),
)
def d09_benchmark_decontamination(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return ngram_decontaminate(corpus, bench, "doc_id", "text", n=5)


@register(
    "smp06_hash_split",
    """
    SELECT doc_id,
           CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val'
                ELSE 'test' END AS split,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
    category="llm-pipeline",
    doc=(
        "deterministic train/val/test assignment from the first hex "
        "char of sha256(doc_id) — 75/12.5/12.5 expected split, stable "
        "under re-ingest and repartitioning, identical across engines. "
        "Narrow per-row expression, zero shuffles."
    ),
)
def smp06_hash_split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        hash_split(d, "doc_id").alias("split"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@register(
    "t15_pii_redaction",
    _T15_SQL,
    category="llm-pipeline",
    doc=(
        "PII scrub: emails / phone numbers / IPv4 addresses replaced "
        "with typed tokens and counted per document. Patterns live in "
        "the Java-regex ∩ RE2 common subset so Spark and the oracle "
        "redact identically; the corpus is synthetic, so deterministic "
        "doc_id-derived PII is planted first and then redacted. Pure "
        "per-row JVM regex projection — zero shuffles."
    ),
)
def t15_pii_redaction(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("text"),
    )
    return pii_redact(planted, "text", ["doc_id"])


@register(
    "a11_hll_distinct_rollup",
    None,  # HLL estimates are engine-specific — rows-only + tolerance tests
    category="llm-pipeline",
    doc=(
        "mergeable-sketch distinct counting: one HLL sketch of the token "
        "stream per language, estimates surfaced per group plus an ALL "
        "row built by hll_union_agg over the per-group sketches — the "
        "100 TB pattern (sketch once, merge anywhere, never re-scan). "
        "Merge is register-wise max: commutative, so the rollup is "
        "deterministic and tests assert union == direct whole-corpus "
        "sketch exactly (tests/test_pipeline.py)."
    ),
)
def a11_hll_distinct_rollup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(whitespace_tokens("text")).alias("tok")
    )
    per_lang = toks.groupBy("lang").agg(
        F.hll_sketch_agg("tok").alias("_sk")
    )
    groups = per_lang.select(
        "lang", F.hll_sketch_estimate("_sk").alias("approx_distinct_tokens")
    )
    total = per_lang.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
            "approx_distinct_tokens"
        )
    ).select(F.lit("ALL").alias("lang"), "approx_distinct_tokens")
    return groups.unionByName(total)


#: Shared raw-text synthesis for t16 (plain SQL, valid in both engines):
#: one third of docs get a PRECOMPOSED accented suffix (U+00E9), one
#: third the DECOMPOSED equivalent (e + U+0301) — byte-different,
#: canonically equal.  NFC must collapse both to the same form.
_T16_RAW_SQL = (
    "concat(text, CASE doc_id % 3 WHEN 0 THEN ' café' "
    "WHEN 1 THEN ' café' ELSE '' END)"
)


@register(
    "t16_unicode_normalize",
    f"""
    SELECT doc_id,
           nfc_normalize({_T16_RAW_SQL}) AS norm_text,
           CAST(length({_T16_RAW_SQL})
                - length(nfc_normalize({_T16_RAW_SQL})) AS BIGINT) AS n_collapsed
    FROM documents
    """,
    category="llm-text",
    doc=(
        "Unicode NFC normalization — the canonical first step of any "
        "multilingual corpus clean (decomposed accents, width variants "
        "and lookalike sequences otherwise defeat exact dedup and "
        "tokenizer vocab lookups). Spark has no NFC builtin, so this is "
        "the documented pandas-UDF escape hatch: Arrow-batched, "
        "partition-local, zero shuffle — the Python cost is a C-level "
        "unicodedata.normalize per string, and the one-third of strings "
        "already in NFC take the is_normalized fast path. Oracle: "
        "DuckDB's nfc_normalize on byte-identical synthesized input."
    ),
)
def t16_unicode_normalize(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_T16_RAW_SQL).alias("raw_text")
    )
    return d.select(
        "doc_id",
        nfc(F.col("raw_text")).alias("norm_text"),
        (F.length("raw_text") - F.length(nfc(F.col("raw_text"))))
        .cast("long")
        .alias("n_collapsed"),
    )


@register(
    "a13_content_fingerprint",
    """
    WITH rows_c AS (
        SELECT o_orderstatus,
               concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                         o_orderpriority,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
               ) AS canon
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(sha256(canon), 1, 10)) AS BIGINT))
                AS BIGINT) AS fingerprint
    FROM rows_c GROUP BY o_orderstatus
    """,
    category="llm-pipeline",
    doc=(
        "order-independent table content fingerprint: each row renders "
        "to a canonical string, sha256 of it yields a 40-bit integer, "
        "and the per-group SUM is the digest — commutative, so the "
        "result is identical under any partitioning, ordering, or "
        "engine, and two-phase aggregation (map-side partial sums) "
        "makes it one narrow shuffle at any scale. This is how you "
        "verify a 100 TB migration or a re-ingest actually preserved "
        "content without sorting or comparing rows."
    ),
)
def a13_content_fingerprint(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    v = F.conv(F.substring(F.sha2(canon, 256), 1, 10), 16, 10).cast("long")
    return (
        o.select(F.col("o_orderstatus"), v.alias("v"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("v").cast("long").alias("fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# RAG chunking, graded decontamination, bloom-filter decontamination
# ---------------------------------------------------------------------------

CHUNK_WORDS = 40
CHUNK_STRIDE = 30


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = CHUNK_WORDS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / embedding-prep
    primitive): overlapping ``chunk_words``-word windows advancing by
    ``stride``, last window always reaching the end of the document.

    Returns (id, chunk_id, chunk, n_words). Words materialize once per
    row, then a single posexplode emits every chunk — narrow, zero
    shuffles, embarrassingly parallel at any corpus size. Start
    positions stop once a window covers the tail (``1 + ceil((n - W)/S)``
    starts), so no chunk is a strict suffix of its predecessor."""
    w = df.select(F.col(id_col), whitespace_tokens(text_col).alias("_w"))
    n = F.size("_w")
    n_chunks = (
        F.lit(1)
        + F.when(
            n > chunk_words,
            F.ceil((n - chunk_words) / F.lit(float(stride))),
        ).otherwise(F.lit(0))
    ).cast("bigint")
    return w.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("_w"), i * stride + 1, chunk_words),
            )
        ).alias("chunk_id", "_c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.concat_ws(" ", "_c").alias("chunk"),
        F.size("_c").cast("bigint").alias("n_words"),
    )


@register(
    "t18_document_chunking",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    c AS (
        SELECT doc_id, words,
               1 + CASE WHEN len(words) > 40
                        THEN CAST(ceil((len(words) - 40) / 30.0) AS BIGINT)
                        ELSE 0 END AS n_chunks
        FROM w
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_id,
           array_to_string(words[(i*30+1):(i*30+40)], ' ') AS chunk,
           CAST(len(words[(i*30+1):(i*30+40)]) AS BIGINT) AS n_words
    FROM c CROSS JOIN LATERAL (SELECT unnest(range(n_chunks)) AS i) g
    """,
    category="llm-pipeline",
    doc=(
        "sliding-window chunking for RAG/embedding prep: 40-word windows "
        "with 30-word stride (10-word overlap), last window anchored to "
        "the document tail. One tokenize + one posexplode per document — "
        "no shuffle, no UDF; output scales linearly with corpus tokens, "
        "exactly the plan you want feeding a 100 TB embedding job."
    ),
)
def t18_document_chunking(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text")


def ngram_overlap_score(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Graded contamination: per corpus document, the fraction of its
    distinct word ``n``-grams that appear anywhere in the benchmark set
    (d09's binary flag generalized to the score thresholded in real
    pipelines, e.g. "drop if >80% of 5-grams overlap").

    Returns (id, n_total, n_matched, overlap_score) for every corpus
    document. Same scale shape as d09 — grams become xxhash64 longs, the
    benchmark side DISTINCT-collapses to its vocabulary before the join
    (broadcast when it fits), and the per-doc total/matched counts are
    two-phase aggregates; the score divides two exact BIGINTs."""
    from .dedup import shingles_from_words

    def grams(df: DataFrame) -> DataFrame:
        # spread_scan: parallelize the CPU-bound explode when the scan
        # is sub-core-count (unsplittable test fixture); no-op at scale
        return (
            spread_scan(df, id_col).select(
                F.col(id_col),
                F.explode(
                    shingles_from_words(whitespace_tokens(text_col), n)
                ).alias("_g"),
            )
            .select(id_col, F.xxhash64("_g").alias("gram"))
            .distinct()
        )

    bench_grams = grams(benchmark).select("gram").distinct()
    cg = grams(corpus)
    totals = cg.groupBy(id_col).agg(F.count("*").alias("n_total"))
    # benchmark vocabulary is fixed-size by construction — explicit
    # broadcast (r9): corpus grams never shuffle, no gram hot-key hazard
    matched = (
        cg.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        totals.join(matched, id_col, "left")
        .select(
            id_col,
            "n_total",
            F.coalesce("n_matched", F.lit(0)).cast("bigint").alias("n_matched"),
            F.round(
                F.coalesce("n_matched", F.lit(0)) / F.col("n_total"), 6
            ).alias("overlap_score"),
        )
    )


@register(
    "t19_ngram_overlap_score",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(words) < 5 THEN [array_to_string(words, ' ')]
                    ELSE [array_to_string(words[(i+1):(i+5)], ' ')
                          for i in range(len(words)-4)] END AS grams
        FROM w
    ),
    bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
    cg AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g
           WHERE doc_id % 20 <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_total FROM cg GROUP BY doc_id),
    m AS (SELECT doc_id, COUNT(*) AS n_matched
          FROM cg JOIN bg USING (gram) GROUP BY doc_id)
    SELECT tot.doc_id,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(COALESCE(n_matched, 0) AS BIGINT) AS n_matched,
           ROUND(COALESCE(n_matched, 0) / CAST(n_total AS DOUBLE), 6)
               AS overlap_score
    FROM tot LEFT JOIN m USING (doc_id)
    """,
    category="llm-pipeline",
    doc=(
        "graded test-set contamination score: fraction of each corpus "
        "document's distinct 5-grams found in the benchmark subset "
        "(doc_id %% 20 = 0). d09 flags any overlap; real pipelines "
        "threshold this ratio. Exact integer counts, one gram join."
    ),
)
def t19_ngram_overlap_score(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return ngram_overlap_score(corpus, bench, "doc_id", "text", n=5)


def _bloom_positions(gram: Column, k: int, m_bits: int) -> Column:
    """The k bit positions of ``gram`` (a 64-bit hash) in an m-bit Bloom
    filter: position_i = pmod(xxhash64(gram, i), m). Same expression on
    the build and probe side, so membership has zero false negatives."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(F.xxhash64(gram, i), F.lit(m_bits)),
    )


def _sha_bloom_positions(gram: Column, k: int, m_bits: int) -> Column:
    """The d22 audit position family: position_i = sha256('i:'||gram)
    40-bit prefix mod m — identical arithmetic in DuckDB, so an oracle
    replays every set bit and every probe (the d20/d21 discipline).
    ``gram`` is the raw gram STRING here (no intermediate 64-bit hash)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.sha2(F.concat(F.lit(f"{i}:"), gram), 256), 1, 10
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 7,
    hash_family: str = "xxhash",
) -> DataFrame:
    """Bloom-filter decontamination: the benchmark's n-gram vocabulary is
    folded into one m-bit Bloom filter built as a distributed bitmap
    aggregate — each gram explodes to its k bit positions, positions
    group by 64-bit word index, and ``bit_or`` folds each word — then the
    (word_idx -> bits) map broadcasts as one row and every corpus gram
    probes it with pure JVM expressions (no join against the vocabulary).

    Returns (id, n_candidate) for documents with >=1 probable benchmark
    gram. Zero false negatives (identical hash family on both sides);
    false-positive rate ~(1-e^(-kn/m))^k — ~0.8%% at n=100k, m=2^20,
    k=7. The 100 TB shape: the exact-join pass (d09) shuffles the corpus
    gram table against the vocabulary, while the bloom pass ships a
    ~130 KB bitmap to every executor and filters map-side; the surviving
    candidates (a tiny fraction) are then exact-verified. The build is
    two-phase (map-side partial bit_or), so no single node ever sees the
    whole vocabulary; only the finished bitmap (m/8 bytes of model
    state, like the IVF centroids in similarity.py) passes through the
    driver and is re-shipped as ONE BinaryType literal — a single py4j
    value and a single Catalyst node, so construction and analysis stay
    O(1) in m (an array<bigint> literal paid ~9 s of per-element py4j
    calls plus O(m) analysis; a MapType column linear-scanned 16k
    entries per probe). Probes read one byte with
    substring/hex/conv — O(1), all JVM.

    Neither side pays a pre-shuffle DISTINCT: bit_or is idempotent so
    duplicate build grams set the same bits, and the probe filters
    BEFORE deduplicating — the only shuffle in the whole pass carries
    the surviving (doc, gram) candidates, not the corpus gram stream.
    Mirrors Spark's own runtime bloom pruning."""
    from .dedup import shingles_from_words

    # ``hash_family``: 'xxhash' is production (grams collapse to 64-bit
    # hashes before the position fan-out — one hash per gram, fixed-
    # width shuffle rows); 'sha' is the d22 oracle-audit family (raw
    # gram strings, sha256-derived positions DuckDB replays). Same
    # bitmap pack, same probe arithmetic, same candidate semantics.
    hashed = F.xxhash64 if hash_family == "xxhash" else (lambda c: c)
    positions = (
        _bloom_positions if hash_family == "xxhash" else _sha_bloom_positions
    )

    def grams(df: DataFrame) -> DataFrame:
        # raw (id, gram) stream — deliberately NOT distinct, see above.
        # spread_scan: parallelize the CPU-bound explode when the scan
        # is sub-core-count (unsplittable test fixture); no-op at scale
        return spread_scan(df, id_col).select(
            F.col(id_col),
            F.explode(
                shingles_from_words(whitespace_tokens(text_col), n)
            ).alias("_g"),
        ).select(id_col, hashed(F.col("_g")).alias("gram"))

    one = F.lit(1).cast("long")
    entries = (
        grams(benchmark)
        .select(F.explode(positions(F.col("gram"), k, m_bits)).alias("p"))
        .select(
            F.shiftright("p", 6).cast("int").alias("widx"),
            F.call_function(
                "shiftleft", one, F.pmod("p", F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()  # model state: <= m/64 longs (~128 KB at m=2^20)
    )
    # pack little-endian: global bit p lives at byte p>>3, bit p&7
    bitmap = bytearray(m_bits // 8)
    for r in entries:
        bitmap[8 * r["widx"] : 8 * r["widx"] + 8] = struct.pack(
            "<q", r["bits"]
        )
    bf = F.lit(bytes(bitmap))

    def _byte_at(p: Column) -> Column:
        return F.conv(
            F.hex(F.substring(bf, F.shiftright(p, 3).cast("int") + 1, 1)),
            16,
            10,
        ).cast("int")

    hit = F.forall(
        positions(F.col("gram"), k, m_bits),
        lambda p: (
            _byte_at(p).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1), F.pmod(p, F.lit(8)).cast("int")
                )
            )
            != 0
        ),
    )
    return (
        grams(corpus)
        .filter(hit)
        .distinct()  # dedup only the survivors (exact candidate-gram count)
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_candidate"))
    )


@register(
    "d14_bloom_decontamination",
    None,  # bloom probes are probabilistic (FPR > 0): rows-only by design;
    # the pytest property asserts zero false negatives vs the exact d09 join
    # and a bounded candidate inflation.
    category="llm-pipeline",
    doc=(
        "decontamination via broadcast Bloom filter instead of a "
        "vocabulary join: benchmark 5-grams fold into a 2^20-bit bitmap "
        "via two-phase bit_or aggregation (~130 KB), corpus grams probe "
        "it map-side with pure expressions. No false negatives; candidates "
        "exact-verified downstream. At 100 TB this replaces the "
        "decontamination shuffle entirely."
    ),
)
def d14_bloom_decontamination(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return bloom_decontaminate(corpus, bench, "doc_id", "text", n=5)


#: Boilerplate patterns in the Java-regex / RE2 common subset (no
#: lookaround, no backreferences): script/style blocks die whole, then
#: any remaining tag, then whitespace collapses.
_HTML_BLOCK_RE = (
    r"(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
)
_HTML_TAG_RE = r"<[^>]+>"

#: Planting expression shared by both engines (t15's pattern): the
#: corpus has no markup, so deterministic tags derived from doc_id make
#: the strip verifiable cross-engine.
_T20_PLANT_SQL = (
    "text || ' <div id=\"d' || CAST(doc_id AS VARCHAR)"
    " || '\" class=\"promo\">click here</div>"
    "<script type=\"text/javascript\">track(' || CAST(doc_id AS VARCHAR)"
    " || ');</script><style>.p' || CAST(doc_id % 7 AS VARCHAR)"
    " || ' {color:red}</style>'"
)


def html_strip(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Boilerplate removal (the trafilatura/jusText stage reduced to its
    regex core): script/style blocks removed whole, remaining tags
    stripped, whitespace collapsed. Per-row JVM regex — zero shuffles,
    linear at any corpus size. Returns per-doc tag/block counts so a
    downstream quality rule can drop markup-dominated documents."""
    t = F.col(text_col)
    n_blocks = F.regexp_count(t, F.lit(_HTML_BLOCK_RE))
    deblocked = F.regexp_replace(t, _HTML_BLOCK_RE, " ")
    n_tags = F.regexp_count(deblocked, F.lit(_HTML_TAG_RE))
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(deblocked, _HTML_TAG_RE, " "), r"\s+", " "
        )
    )
    return df.select(
        *id_cols,
        clean.alias("clean_text"),
        n_blocks.cast("long").alias("n_blocks"),
        n_tags.cast("long").alias("n_tags"),
    )


@register(
    "t20_html_strip",
    f"""
    WITH planted AS (
        SELECT doc_id, {_T20_PLANT_SQL} AS text FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(
               regexp_replace(text, '{_HTML_BLOCK_RE}', ' ', 'g'),
               '{_HTML_TAG_RE}', ' ', 'g'), '\\s+', ' ', 'g')) AS clean_text,
           CAST(len(regexp_extract_all(text, '{_HTML_BLOCK_RE}'))
               AS BIGINT) AS n_blocks,
           CAST(len(regexp_extract_all(
               regexp_replace(text, '{_HTML_BLOCK_RE}', ' ', 'g'),
               '{_HTML_TAG_RE}')) AS BIGINT) AS n_tags
    FROM planted
    """,
    category="llm-pipeline",
    doc=(
        "HTML boilerplate stripping (crawler-output cleaning): "
        "script/style blocks removed whole, residual tags stripped, "
        "whitespace collapsed; per-doc block/tag counts feed "
        "markup-density quality rules. Markup is planted "
        "deterministically from doc_id (the corpus is clean text), so "
        "both engines verify the identical strip. Pure per-row regex "
        "in the Java/RE2 common subset — zero shuffles."
    ),
)
def t20_html_strip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id", F.expr(_T20_PLANT_SQL.replace("VARCHAR", "STRING")).alias("text")
    )
    return html_strip(planted, "text", ["doc_id"])


@register(
    "smp12_leakage_free_split",
    """
    WITH raw AS (
        SELECT doc_id, text,
               CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                    THEN 'train'
                    WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
                    THEN 'val'
                    ELSE 'test' END AS split_raw
        FROM documents
    ),
    grp AS (
        SELECT sha256(text) AS h,
               COUNT(DISTINCT split_raw) AS n_splits
        FROM raw GROUP BY h
    )
    SELECT r.doc_id, r.split_raw,
           CASE WHEN g.n_splits > 1 THEN 'train' ELSE r.split_raw END
               AS split_final,
           g.n_splits > 1 AS leaked
    FROM raw r JOIN grp g ON sha256(r.text) = g.h
    """,
    category="llm-sampling",
    doc=(
        "leakage-free train/val/test split: the deterministic hash "
        "split (smp06) followed by a duplicate-leak repair — any "
        "content group (sha256(text)) whose members land in more than "
        "one split is forced entirely into train, so no eval document "
        "has a training-set twin. One content-hash aggregate + one "
        "group-keyed join back; at 100 TB swap exact content groups for "
        "the near-dup clusters d13 emits and the same two-stage shape "
        "holds. The repair direction (demote to train) is the "
        "conservative one: eval sets shrink, they never contaminate."
    ),
)
def smp12_leakage_free_split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.sha2("text", 256).alias("h"),
        hash_split(d, "doc_id").alias("split_raw"),
    )
    # build side reduced to LEAKED groups only (r9): joining back the
    # full per-hash aggregate would carry one row per distinct document
    # (never broadcastable at corpus scale) and put every hot
    # exact-duplicate hash through an SMJ partition AQE cannot split
    # (aggregate above the build shuffle — the t27 probe). Leaked
    # groups (content spanning splits) are rare by construction, so the
    # reduced build side broadcasts and the corpus rows never shuffle.
    leaked = (
        raw.groupBy("h")
        .agg(F.count_distinct("split_raw").alias("_ns"))
        .filter(F.col("_ns") > 1)
        .select("h", F.lit(True).alias("_leaked"))
    )
    return raw.join(leaked, "h", "left").select(
        "doc_id",
        "split_raw",
        F.when(F.col("_leaked"), F.lit("train"))
        .otherwise(F.col("split_raw"))
        .alias("split_final"),
        F.coalesce("_leaked", F.lit(False)).alias("leaked"),
    )
