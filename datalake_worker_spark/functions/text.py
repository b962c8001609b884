"""Text analysis operators for training-data pipelines (SURVEY.md §2.2):
token counting, quality scoring, language-ID heuristic, document
frequency, fingerprinting. All built-in string/array expressions —
JVM-side, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# language marker words for the n-gram language-ID heuristic.
# (The test corpus is synthetic; the heuristic itself is the operator.)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " de "],
    "fr": [" le ", " les ", " des "],
    "zh": [" zh ", " zhong ", " wen "],
}

STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]


def whitespace_tokens(text_col: str | Column = "text") -> Column:
    """THE tokenization used by every text operator and its SQL oracle
    (``regexp_split_to_array(trim(text), '\\s+')`` on the DuckDB side).
    Change both together or the oracles diverge."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def explode_tokens(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, tok) rows — the shared tokenize→explode front of t04/t06/t10.

    spread_scan first: the explode is CPU-bound per row and the test
    fixtures are unsplittable single-file scans; no-op at scale."""
    from ..sources import spread_scan

    return spread_scan(df, id_col).select(
        id_col, F.explode(whitespace_tokens(text_col)).alias("tok")
    )


def count_occurrences(text: Column, needle: str) -> Column:
    """# of occurrences of a literal substring (JVM: length arithmetic)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: split on word boundaries/punctuation clusters."""
    return F.size(
        F.filter(
            F.split(text, r"[\s]+|(?=[^\w\s])|(?<=[^\w\s])"),
            lambda t: F.length(t) > 0,
        )
    )


@register(
    "t01_token_stats",
    r"""
    WITH d AS (SELECT doc_id, n_chars, regexp_split_to_array(trim(text), '\s+') AS w
               FROM documents)
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(w)) AS INTEGER) AS n_unique,
           ROUND(CAST(n_chars AS DOUBLE) / len(w), 6) AS chars_per_token,
           ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr
    FROM d
    """,
    category="llm-text",
    doc="token counting: whitespace tokens, unique tokens, type-token ratio.",
)
def t01_token_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.trim(F.col("text")), r"\s+")
    )
    return d.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_unique"),
        F.round(F.col("n_chars").cast("double") / F.size("w"), 6).alias(
            "chars_per_token"
        ),
        F.round(
            F.size(F.array_distinct("w")).cast("double") / F.size("w"), 6
        ).alias("ttr"),
    )


@register(
    "t02_quality_score",
    r"""
    WITH d AS (
        SELECT doc_id, text, n_chars,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
               length(text) - length(replace(lower(text), ' the ', ''))  AS _dummy
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_chars, n_tok,
               ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
               ROUND(CAST(
                 (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
               + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' a ', ''))) / 3
               + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4
                 AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stopword_ratio
        FROM d
    )
    SELECT doc_id, n_tok AS n_tokens, punct_ratio, stopword_ratio,
           ROUND(0.5 * LEAST(n_tok / 100.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.2 * LEAST(stopword_ratio * 5.0, 1.0), 6) AS quality
    FROM s
    """,
    category="llm-text",
    doc="quality scoring: length/punctuation/stopword ratios → composite score.",
)
def t02_quality_score(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    n_tok = token_count(F.col("text"))
    punct_ratio = F.round(
        F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.col("n_chars"),
        6,
    )
    stop_hits = (
        count_occurrences(padded, " the ")
        + count_occurrences(padded, " a ")
        + count_occurrences(padded, " of ")
    )
    stopword_ratio = F.round(stop_hits.cast("double") / n_tok, 6)
    quality = F.round(
        0.5 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - punct_ratio)
        + 0.2 * F.least(stopword_ratio * 5.0, F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def _langid_scores_spark(text: Column) -> list[tuple[str, Column]]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = None
        for m in markers:
            c = count_occurrences(padded, m)
            score = c if score is None else score + c
        out.append((lang, score))
    return out


def _langid_sql_score(lang: str) -> str:
    parts = [
        f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}"
        for m in LANG_MARKERS[lang]
    ]
    return " + ".join(parts)


@register(
    "t03_language_id",
    f"""
    WITH d AS (SELECT doc_id, lang AS label, ' ' || lower(text) || ' ' AS p FROM documents),
    s AS (
        SELECT doc_id, label,
               {', '.join(f"CAST({_langid_sql_score(lng)} AS INTEGER) AS s_{lng}" for lng in sorted(LANG_MARKERS))}
        FROM d
    )
    SELECT doc_id, label,
           CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
             WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted,
           CAST(GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS INTEGER) AS best_score
    FROM s
    """,
    category="llm-text",
    doc="language-ID heuristic: marker-word counts, argmax with alphabetical tie-break.",
)
def t03_language_id(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    scores = _langid_scores_spark(F.col("text"))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("zh")
    # CASE chain in alphabetical order — first match wins, same as the SQL
    expr = None
    for lang, s in scores:
        cond = s == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr.otherwise("zh")
    return d.select(
        "doc_id",
        F.col("lang").alias("label"),
        pred.alias("predicted"),
        best.cast("int").alias("best_score"),
    )


@register(
    "t08_text_cleaning",
    r"""
    SELECT doc_id,
           regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS no_urls,
           regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS no_numbers,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS normalized,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels
    FROM documents
    WHERE doc_id < 200
    """,
    category="llm-text",
    doc="cleaning/masking battery: URL + number masking, whitespace normalization.",
)
def t08_text_cleaning(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_replace("text", r"https?://[^\s]+", "<URL>").alias("no_urls"),
        F.regexp_replace("text", r"[0-9]+", "<NUM>").alias("no_numbers"),
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias(
            "normalized"
        ),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[aeiou]", ""))
        ).cast("long").alias("n_vowels"),
    )


@register(
    "t09_bigram_counts",
    r"""
    WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    g AS (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram FROM w WHERE len(w) >= 2)
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY gram
    ORDER BY n DESC, gram ASC
    LIMIT 20
    """,
    category="llm-text",
    doc="word-bigram frequency top-20 (n-gram language-model counts).",
)
def t09_bigram_counts(spark, sf_dir):
    from .dedup import shingles_from_words

    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.split(F.trim(F.col("text")), r"\s+").alias("w")).filter(
        F.size("w") >= 2
    )
    return (
        w.select(F.explode(shingles_from_words(F.col("w"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(20)
    )


@register(
    "t11_boilerplate_ngrams",
    r"""
    WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS gram
        FROM w WHERE len(w) >= 2
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS df,
           ROUND(CAST(COUNT(*) AS DOUBLE) / n.n_docs, 6) AS doc_frac
    FROM g CROSS JOIN n
    GROUP BY gram, n.n_docs
    HAVING CAST(COUNT(*) AS DOUBLE) / n.n_docs > 0.2
    """,
    category="llm-text",
    doc=(
        "exact heavy-hitters: bigrams present in >20% of documents "
        "(boilerplate/template detection for corpus cleaning)."
    ),
)
def t11_boilerplate_ngrams(spark, sf_dir):
    from .dedup import shingles_from_words

    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_words(F.col("w"), 2))
            ).alias("gram"),
        )
    )
    # N via broadcast 1-row total, not a driver-side d.count() second scan
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        g.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .withColumn("doc_frac", F.round(F.col("df") / F.col("n_docs"), 6))
        .filter(F.col("df") / F.col("n_docs") > 0.2)
        .drop("n_docs")
    )


@register(
    "t12_repetition_ratio",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_token_ratio,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_frac,
           (CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.1) AS is_repetitive
    FROM tf
    GROUP BY doc_id
    """,
    category="llm-text",
    doc=(
        "intra-document repetition signals (Gopher-style quality rule): "
        "duplicate-token ratio and most-frequent-token fraction; docs "
        "dominated by one token get flagged. explode→two-phase agg, no "
        "per-row array re-walks."
    ),
)
def t12_repetition_ratio(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tf = explode_tokens(d).groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    n_tok = F.sum("c")
    top = F.max("c").cast("double")
    return tf.groupBy("doc_id").agg(
        n_tok.alias("n_tokens"),
        F.round(F.lit(1.0) - F.count("*").cast("double") / n_tok, 6).alias(
            "dup_token_ratio"
        ),
        F.round(top / n_tok, 6).alias("top_token_frac"),
        (top / n_tok > 0.1).alias("is_repetitive"),
    )


@register(
    "t13_bpe_token_count",
    r"""
    WITH p AS (
        SELECT doc_id, n_chars,
               regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]') AS pieces
        FROM documents
    )
    SELECT doc_id,
           CAST(len(pieces) AS INTEGER) AS n_pieces,
           ROUND(CAST(n_chars AS DOUBLE) / len(pieces), 6) AS chars_per_piece
    FROM p WHERE len(pieces) > 0
    """,
    category="llm-text",
    doc=(
        "BPE-ish token accounting: word/punctuation pieces via "
        "regexp_extract_all (lookaround-free so the RE2 oracle agrees); "
        "chars-per-piece is the budget estimator for sequence packing."
    ),
)
def t13_bpe_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pieces = F.expr(r"regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]', 0)")
    return (
        d.select("doc_id", "n_chars", pieces.alias("pieces"))
        .filter(F.size("pieces") > 0)
        .select(
            "doc_id",
            F.size("pieces").alias("n_pieces"),
            F.round(F.col("n_chars") / F.size("pieces"), 6).alias("chars_per_piece"),
        )
    )


@register(
    "t04_doc_frequency",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
        FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
    FROM tok GROUP BY tok
    ORDER BY df DESC, tok ASC
    LIMIT 20
    """,
    category="llm-text",
    doc="document frequency (idf numerator): distinct-token explode → count per token.",
)
def t04_doc_frequency(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(whitespace_tokens())).alias("tok"),
        )
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(20)
    )


@register(
    "t05_fingerprint",
    None,  # xxhash64-based rolling fingerprint — no DuckDB analog; pytest property-tested
    category="llm-text",
    doc=(
        "document fingerprint: min-of-rolling-hash (winnowing-lite) over char "
        "5-gram xxhash64 + content hash of the normalized token sequence."
    ),
)
def t05_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # materialize the normalized text ONCE: referenced inside the
    # transform() lambda it would re-run the regexp per character
    # position (O(n²) in doc length — measured ~5× on this query)
    norm = F.col("_norm")
    base = d.select(
        "doc_id", F.lower(F.regexp_replace("text", r"[^a-zA-Z0-9 ]", "")).alias("_norm")
    )
    toks = F.split(F.trim(norm), r"\s+")
    content_fp = F.xxhash64(F.concat_ws("\x01", toks))
    # rolling 5-gram hashes via substr over positions
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - 4, F.lit(1))),
        lambda i: F.xxhash64(norm.substr(i, F.lit(5))),
    )
    winnow_fp = F.array_min(grams)
    return base.select(
        "doc_id",
        content_fp.alias("content_fp"),
        winnow_fp.alias("winnow_fp"),
    )


@register(
    "t17_quality_filter_verdict",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    sig AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(c * length(tok)) AS DOUBLE) / SUM(c), 6) AS mean_tok_len,
               ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_token_ratio,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_frac
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, mean_tok_len, dup_token_ratio, top_token_frac,
           (n_tokens BETWEEN 20 AND 1000) AND (mean_tok_len BETWEEN 2.0 AND 12.0)
               AND dup_token_ratio <= 0.5 AND top_token_frac <= 0.2 AS keep,
           concat_ws(',',
               CASE WHEN n_tokens NOT BETWEEN 20 AND 1000 THEN 'length' END,
               CASE WHEN mean_tok_len NOT BETWEEN 2.0 AND 12.0 THEN 'word_len' END,
               CASE WHEN dup_token_ratio > 0.5 THEN 'dup_tokens' END,
               CASE WHEN top_token_frac > 0.2 THEN 'top_token' END) AS reasons
    FROM sig
    """,
    category="llm-text",
    doc=(
        "combined quality-filter verdict (Gopher/C4-style rule stack): "
        "token-count bounds, mean word length bounds, duplicate-token "
        "and top-token-dominance thresholds fold into one keep/drop "
        "decision with machine-readable failure reasons. One explode + "
        "one two-phase aggregate computes every signal — the pipeline "
        "endpoint form of t02/t12: a corpus filter you can apply "
        "verbatim at 100 TB (narrow shuffle keyed on doc_id, no text "
        "movement after tokenization)."
    ),
)
def t17_quality_filter_verdict(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(whitespace_tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    sig = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.col("c") * F.length("tok")).cast("double") / F.sum("c"), 6
        ).alias("mean_tok_len"),
        F.round(1.0 - F.count("*").cast("double") / F.sum("c"), 6).alias(
            "dup_token_ratio"
        ),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_token_frac"),
    )
    ok_len = F.col("n_tokens").between(20, 1000)
    ok_wlen = F.col("mean_tok_len").between(2.0, 12.0)
    ok_dup = F.col("dup_token_ratio") <= 0.5
    ok_top = F.col("top_token_frac") <= 0.2
    return sig.select(
        "doc_id",
        "n_tokens",
        "mean_tok_len",
        "dup_token_ratio",
        "top_token_frac",
        (ok_len & ok_wlen & ok_dup & ok_top).alias("keep"),
        F.concat_ws(
            ",",
            F.when(~ok_len, F.lit("length")),
            F.when(~ok_wlen, F.lit("word_len")),
            F.when(~ok_dup, F.lit("dup_tokens")),
            F.when(~ok_top, F.lit("top_token")),
        ).alias("reasons"),
    )
