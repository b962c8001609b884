"""TF-IDF and lexicon-join scoring (SURVEY.md §2.2 "text analysis";
the sentiment-lexicon join follows the Spark pattern described in the
EDBT'16 reference of PAPERS.md — tokenize, join against a scored
lexicon, aggregate per document)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..registry import register
from ..sources import load_table, spread_scan
from .text import explode_tokens, whitespace_tokens

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
    # salted (r9): "the"'s df row meets ~every document's tf row — a
    # Zipfian-hot probe key on a join AQE cannot skew-split (the df
    # aggregate sits above the build shuffle; the t27 probe). The df
    # table is key-collapsed, so 8x replication is vocabulary-sized.
    scored = (
        salted_join(tf, df, "tok")
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
    # salted (r9): the probe side is every TOKEN OCCURRENCE — the top
    # Zipf token alone is ~5% of the corpus, all hashed to one reducer
    # in an unsalted join (unsplittable by AQE: agg above build shuffle)
    scored = (
        salted_join(tok, freq, "tok")
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


# ---------------------------------------------------------------------------
# t21: TextRank keyword extraction (iterative PageRank, decimal-exact)
# ---------------------------------------------------------------------------

_TR_ITERS = 4
_TR_DAMP = 0.85


def _t21_oracle() -> str:
    """Unrolled fixed-iteration PageRank as plain CTEs (recursive CTEs
    cannot aggregate in the recursive member, so the K iterations are
    generated mechanically). Same arithmetic as the Spark side:
    contributions rounded to 12 dp and summed as DECIMAL (t10's
    order-independence trick), new rank rounded to 12 dp."""
    head = r"""
    WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    g AS (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
          FROM w WHERE len(w) >= 2),
    pe AS (SELECT split_part(gram, ' ', 1) AS a, split_part(gram, ' ', 2) AS b FROM g),
    fe AS (SELECT a, b FROM pe WHERE len(a) >= 4 AND len(b) >= 4 AND a != b),
    und AS (SELECT DISTINCT a, b FROM
            (SELECT a, b FROM fe UNION ALL SELECT b AS a, a AS b FROM fe)),
    deg AS (SELECT a, COUNT(*) AS outdeg FROM und GROUP BY a),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr0 AS (SELECT d.a AS token, ROUND(1.0 / nn.n, 12) AS pr
            FROM deg d CROSS JOIN nn)"""
    steps = []
    for i in range(1, _TR_ITERS + 1):
        steps.append(f"""
    pr{i} AS (
        SELECT e.b AS token,
               ROUND(0.15 / MAX(nn.n) + {_TR_DAMP} * CAST(SUM(CAST(
                   ROUND(p.pr / d.outdeg, 12) AS DECIMAL(38,12))) AS DOUBLE), 12)
                   AS pr
        FROM und e
        JOIN pr{i - 1} p ON e.a = p.token
        JOIN deg d ON e.a = d.a
        CROSS JOIN nn
        GROUP BY e.b
    )""")
    tail = f"""
    SELECT token, pr FROM pr{_TR_ITERS} ORDER BY pr DESC, token ASC LIMIT 10
    """
    return head + "," + ",".join(steps) + tail


@register(
    "t21_textrank_keywords",
    _t21_oracle(),
    category="llm-text",
    doc=(
        "TextRank keyword extraction: undirected token co-occurrence "
        "graph (adjacent tokens, len >= 4, the classic window-2 build) "
        "ranked by 4 damped PageRank iterations, top-10 keywords. The "
        "iterative-algorithm class done Spark-first AND still oracle-"
        "checked: each iteration is one edges-join-ranks + two-phase "
        "per-vertex sum (vertex state is O(vocab), never corpus-scale), "
        "per-edge contributions are rounded and summed as DECIMAL so "
        "every iteration is order/partitioning-independent and both "
        "engines walk bit-identical trajectories — the oracle unrolls "
        "the K iterations into generated CTEs since SQL recursion "
        "cannot aggregate. Top-10 is TakeOrdered, no global sort. At "
        "100 TB the graph build dominates (one explode + distinct); "
        "iterations touch only the vocabulary-sized edge list."
    ),
)
def t21_textrank_keywords(spark, sf_dir):
    from .dedup import shingles_from_words

    d = load_table(spark, sf_dir, "documents")
    # spread_scan: bigram explode is CPU-bound — parallelize the
    # sub-core-count single-file scan; no-op at scale
    w = spread_scan(d, "doc_id").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 2)
    grams = w.select(F.explode(shingles_from_words(F.col("w"), 2)).alias("gram"))
    pe = grams.select(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("a"),
        F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("b"),
    )
    fe = pe.filter(
        (F.length("a") >= 4) & (F.length("b") >= 4) & (F.col("a") != F.col("b"))
    )
    # symmetrize in ONE pass (r14, the connected_components fix): the
    # unionAll form referenced ``fe`` twice, so the corpus explode +
    # split ran twice per materialization (profiled as 64-task jobs
    # reading the spread exchange's output two full times). Exploding
    # both directions from each row is the same multiset into the same
    # distinct.
    und = (
        fe.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("outdeg"))
    edges = und.join(deg, "a").persist()
    try:
        # vocabulary-scale scalar (bounded model state). Counting
        # distinct sources on EDGES (== deg.count(): every und row has
        # a deg row by construction) populates the edge cache in this
        # job, so the iteration job below reads the cache instead of
        # re-running the corpus explode+distinct (was two full corpus
        # passes per call)
        n = edges.select("a").distinct().count()
        ranks = deg.select(
            F.col("a").alias("token"), F.lit(round(1.0 / n, 12)).alias("pr")
        )
        base = 0.15 / n
        for _ in range(_TR_ITERS):
            contrib = edges.join(ranks, edges["a"] == ranks["token"]).select(
                F.col("b"),
                F.round(F.col("pr") / F.col("outdeg"), 12)
                .cast("decimal(38,12)")
                .alias("c"),
            )
            ranks = contrib.groupBy("b").agg(
                F.round(
                    F.lit(base) + F.lit(_TR_DAMP) * F.sum("c").cast("double"), 12
                ).alias("pr")
            ).select(F.col("b").alias("token"), "pr")
        out = ranks.orderBy(F.col("pr").desc(), F.col("token").asc()).limit(10)
        # 10-row result: eager checkpoint lets the edge cache release
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist(blocking=False)


@register(
    "t22_pmi_collocations",
    r"""
    WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    g AS (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
          FROM w WHERE len(w) >= 2),
    bg AS (SELECT gram, COUNT(*) AS nab FROM g GROUP BY gram HAVING COUNT(*) >= 5),
    toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             FROM documents),
    u AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    nt AS (SELECT CAST(SUM(n) AS DOUBLE) AS nt FROM u),
    ng AS (SELECT CAST(SUM(nab) AS DOUBLE) AS ng FROM bg)
    SELECT bg.gram, CAST(bg.nab AS BIGINT) AS nab,
           ROUND(LN((bg.nab / ng.ng) / ((a.n / nt.nt) * (b.n / nt.nt))), 6) AS pmi
    FROM bg
    JOIN u a ON split_part(bg.gram, ' ', 1) = a.tok
    JOIN u b ON split_part(bg.gram, ' ', 2) = b.tok
    CROSS JOIN nt CROSS JOIN ng
    ORDER BY pmi DESC, gram ASC LIMIT 20
    """,
    category="llm-text",
    doc=(
        "PMI collocation mining (top-20 bigrams by pointwise mutual "
        "information, min count 5): the phrase-detection pass a "
        "tokenizer-training / vocab-curation pipeline runs before "
        "merging multiword units. Two map-side-combined count "
        "aggregates (bigram + unigram) over one corpus scan each, "
        "unigram table joined twice (broadcastable — vocab-scale), "
        "double LN rounded to 6 dp for cross-engine exactness, "
        "TakeOrdered top-20 (no global sort)."
    ),
)
def t22_pmi_collocations(spark, sf_dir):
    from .dedup import shingles_from_words
    from .text import explode_tokens

    d = load_table(spark, sf_dir, "documents")
    # spread_scan: bigram explode is CPU-bound — parallelize the
    # sub-core-count single-file scan; no-op at scale
    w = spread_scan(d, "doc_id").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 2)
    bg = (
        w.select(F.explode(shingles_from_words(F.col("w"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    u = explode_tokens(d).groupBy("tok").agg(F.count("*").alias("n"))
    nt = u.agg(F.sum("n").cast("double").alias("nt"))
    ng = bg.agg(F.sum("nab").cast("double").alias("ng"))
    ua = u.select(F.col("tok").alias("_ta"), F.col("n").alias("na"))
    ub = u.select(F.col("tok").alias("_tb"), F.col("n").alias("nb"))
    pmi = F.round(
        F.log(
            (F.col("nab") / F.col("ng"))
            / ((F.col("na") / F.col("nt")) * (F.col("nb") / F.col("nt")))
        ),
        6,
    )
    return (
        bg.join(ua, F.split_part(F.col("gram"), F.lit(" "), F.lit(1)) == F.col("_ta"))
        .join(ub, F.split_part(F.col("gram"), F.lit(" "), F.lit(2)) == F.col("_tb"))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ng))
        .select("gram", F.col("nab").cast("long").alias("nab"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("gram").asc())
        .limit(20)
    )


@register(
    "t25_bigram_logprob",
    r"""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    big AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM words, LATERAL (
            SELECT unnest(generate_series(1, len(w) - 1)) AS i
        )
        WHERE len(w) >= 2
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM (
            SELECT unnest(w) AS tok FROM words)
    ),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS n2 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS n1 FROM big GROUP BY w1),
    scored AS (
        SELECT b.doc_id,
               CAST(ROUND(-LN((c2.n2 + 1) / (c1.n1 + vocab.v)), 6)
                    AS DECIMAL(18,6)) AS nll
        FROM big b
        JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        JOIN c1 ON b.w1 = c1.w1
        CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll) AS DOUBLE) AS total_nll,
           CAST(CAST(SUM(nll) * 1000000 AS BIGINT) // COUNT(*) AS DOUBLE)
             / 1000000.0 AS avg_nll
    FROM scored
    GROUP BY doc_id
    """,
    category="llm-text",
    doc=(
        "bigram LM scoring with add-one smoothing: corpus bigram "
        "probabilities P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) -> per-doc "
        "negative log-likelihood — the sharper perplexity-style quality "
        "filter (t10's unigram model scores word choice; this scores "
        "word ORDER, so shuffled/templated text stands out). Bigrams "
        "build map-side from the token array (transform over sequence — "
        "no self-join, no extra shuffle); the count tables join back on "
        "bigram keys and the per-pair -ln p is rounded to 6 dp and "
        "summed as DECIMAL, so aggregates are order-independent and "
        "cross-engine exact (the t10 recipe)."
    ),
)
def t25_bigram_logprob(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", whitespace_tokens("text").alias("w"))
    big = (
        words.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i - 1] AS w1, w[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # vocabulary over ALL docs — the oracle's vocab CTE has no >=2-token
    # filter, and a one-word doc's token belongs in V even though it
    # forms no bigram (review r7: filtering here diverged the smoothing
    # denominator on corpora with short docs)
    vocab = (
        words.select(F.explode("w").alias("tok"))
        .agg(F.count_distinct("tok").cast("double").alias("v"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("n2"))
    c1 = big.groupBy("w1").agg(F.count("*").cast("double").alias("n1"))
    # both count joins salted (r9): the probe side is every bigram
    # OCCURRENCE — ("of","the") and every w1="the" bigram are Zipfian-
    # hot keys on joins AQE cannot skew-split (aggs above the build
    # shuffles); the count tables are key-collapsed so 8x replication
    # stays vocabulary-scale
    scored = (
        salted_join(salted_join(big, c2, ["w1", "w2"]), c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                -F.log((F.col("n2") + 1) / (F.col("n1") + F.col("v"))), 6
            )
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    # avg_nll via exact integer micro-division (the j12 recipe): the
    # 6-dp DECIMAL total is an exact integer count of micro-nats, so
    # floor-dividing by n and scaling back is bit-identical on both
    # engines — ROUND(total/n, 6) hash-mismatched at sf0.1 on two docs
    # whose mean hit an exact .5 at the 6th decimal (34.078655/10)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("nll").alias("_tot"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("_tot").cast("double").alias("total_nll"),
            (
                F.expr("CAST(_tot * 1000000 AS BIGINT) div n_bigrams").cast(
                    "double"
                )
                / F.lit(1000000.0)
            ).alias("avg_nll"),
        )
    )
