"""Training-data pipeline utilities: deterministic sampling, document
packing, exact distribution stats (SURVEY.md §2.2 "beyond the
reference" — the ops a 100 TB data-curation run needs around dedup).

Sampling is hash/key-deterministic (never ``rand()``): re-running the
pipeline, or running it at different parallelism, selects the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def deterministic_sample(df: DataFrame, key: str, pct: int, mod: int = 100) -> DataFrame:
    """Keep rows where key % mod < pct — stable across runs/partitions."""
    return df.filter(F.pmod(F.col(key), F.lit(mod)) < pct)


@register(
    "smp01_stratified_sample",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE ((doc_id % 10) + 10) % 10 < 3
    GROUP BY lang
    """,
    category="llm-sampling",
    doc="deterministic 30% stratified sample (key-hash, not rand()) + per-stratum counts.",
)
def smp01_stratified_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        deterministic_sample(d, "doc_id", 3, 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "smp02_doc_packing",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    ),
    r AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM t
    )
    SELECT source, CAST((running - n_tok) // 512 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM r
    GROUP BY source, bin
    """,
    category="llm-sampling",
    doc=(
        "context-window packing: greedy sequential 512-token bins per source "
        "via running-sum window (one shuffle on the pack key)."
    ),
)
def smp02_doc_packing(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = t.withColumn("running", F.sum("n_tok").over(w))
    return (
        r.withColumn(
            "bin", F.floor((F.col("running") - F.col("n_tok")) / 512).cast("long")
        )
        .groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
    )


@register(
    "smp03_exact_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="llm-sampling",
    doc=(
        "exact interpolated percentiles (quality-threshold selection at "
        "scale), computed SORT-BASED: Spark's native percentile() "
        "aggregate buffers EVERY group value in the agg buffer — memory "
        "grows linearly with rows-per-group, which is fine at 2M values "
        "(~50 MB, measured) and fatal at 100 TB group sizes (billions "
        "of values per flag). It was also the straw in a cumulative-"
        "session OOM on the 10x sweep. The window form sorts per group "
        "(external, disk-spillable) and interpolates between the two "
        "rank-adjacent rows per requested p — bounded memory at any "
        "group size, same quantile_cont semantics (rank = 1+(n-1)p)."
    ),
)
def smp03_exact_percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return exact_group_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p99": 0.99},
    )


def exact_group_percentiles(
    df, key: str, val: str, ps: dict[str, float]
):
    """Exact interpolated per-group percentiles, sort-based (scale-safe).

    One window sort per group (external sort — spills, never OOMs, in
    contrast to percentile()'s value-buffering agg) assigns row_number;
    for each requested p the continuous rank r = 1 + (n-1)p picks the
    two adjacent rows floor(r)/ceil(r) and the final aggregate
    interpolates. Output: (key, <name> for each p), ROUND 6."""
    wsort = W.partitionBy(key).orderBy(val)
    wall = W.partitionBy(key)
    ranked = df.select(
        key,
        F.col(val).cast("double").alias("_v"),
        F.row_number().over(wsort).alias("_rn"),
        F.count("*").over(wall).alias("_n"),
    )
    aggs = []
    for name, p in ps.items():
        r = F.lit(1.0) + (F.col("_n") - 1) * F.lit(p)  # continuous rank
        lo = F.floor(r).cast("long")
        hi = F.least(lo + 1, F.col("_n"))
        frac = r - lo.cast("double")
        v_lo = F.max(F.when(F.col("_rn") == lo, F.col("_v")))
        v_hi = F.max(F.when(F.col("_rn") == hi, F.col("_v")))
        aggs.append(
            F.round(v_lo + F.max(frac) * (v_hi - v_lo), 6).alias(name)
        )
    return ranked.groupBy(key).agg(*aggs)


@register(
    "smp04_histogram",
    """
    SELECT CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(n_chars) AS BIGINT) AS lo,
           CAST(MAX(n_chars) AS BIGINT) AS hi
    FROM documents
    GROUP BY bucket
    """,
    category="llm-sampling",
    doc="length histogram (50-char buckets) — distribution shape for curation cuts.",
)
def smp04_histogram(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("bucket", F.floor(F.col("n_chars") / 50).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )


@register(
    "smp05_temperature_resample",
    """
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    z AS (SELECT SUM(sqrt(cnt)) AS z FROM c),
    q AS (SELECT lang, CAST(ROUND(100 * sqrt(cnt) / z, 0) AS BIGINT) AS quota
          FROM c CROSS JOIN z),
    r AS (SELECT doc_id, lang,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY lang
                     ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
          FROM documents)
    SELECT r.doc_id, r.lang, r.rn, q.quota
    FROM r JOIN q USING (lang)
    WHERE r.rn <= q.quota
    """,
    category="llm-sampling",
    doc=(
        "temperature resampling (alpha=0.5) for training-mix balancing: "
        "per-language quota proportional to count^alpha, rows picked by a "
        "deterministic sha256 shuffle order (re-runs and different "
        "parallelism select identical rows — never rand())."
    ),
)
def smp05_temperature_resample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    z = c.agg(F.sum(F.sqrt("cnt")).alias("z"))
    q = (
        c.crossJoin(F.broadcast(z))
        .select(
            "lang",
            F.round(F.lit(100) * F.sqrt("cnt") / F.col("z"), 0)
            .cast("long")
            .alias("quota"),
        )
    )
    w = W.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), "doc_id"
    )
    r = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rn")
    )
    return r.join(F.broadcast(q), "lang").filter(F.col("rn") <= F.col("quota")).select(
        "doc_id", "lang", "rn", "quota"
    )


def temperature_resample_scalable(
    df,
    key_col: str,
    id_col: str,
    total: int = 100,
    alpha: float = 0.5,
    prefix_len: int = 2,
):
    """Giant-key-safe temperature resampling (SCALE.md smp05 section).

    The declared smp05 query ranks with a per-language window — a single
    task per language. This variant selects the identical rows without
    ever sorting a whole key: a histogram of sha256 PREFIXES (16^prefix_len
    buckets per key, partial-agg, bounded state) locates each key's quota
    threshold; buckets wholly below it pass row-locally, and only the one
    boundary bucket (~1/16^prefix_len of the key) is exactly ranked.

    Returns (key, id) selections equal to the windowed formulation
    (property-tested).
    """
    sha = F.sha2(F.col(id_col).cast("string"), 256)
    base = (
        df.select(key_col, id_col)
        .withColumn("_sha", sha)
        .withColumn("_pfx", F.substring("_sha", 1, prefix_len))
    )
    counts = base.groupBy(key_col).agg(F.count("*").alias("cnt"))
    z = counts.agg(F.sum(F.pow("cnt", F.lit(alpha))).alias("z"))
    quotas = (
        counts.crossJoin(F.broadcast(z))
        .select(
            key_col,
            F.round(F.lit(total) * F.pow("cnt", F.lit(alpha)) / F.col("z"), 0)
            .cast("long")
            .alias("quota"),
        )
    )
    hist = base.groupBy(key_col, "_pfx").agg(F.count("*").alias("n"))
    # cumulative over ≤16^prefix_len histogram rows per key — metadata-scale
    wcum = W.partitionBy(key_col).orderBy("_pfx")
    hist = (
        hist.withColumn("cum", F.sum("n").over(wcum))
        .join(F.broadcast(quotas), key_col)
        .withColumn("prev", F.col("cum") - F.col("n"))
    )
    full = hist.filter(F.col("cum") <= F.col("quota")).select(key_col, "_pfx")
    boundary = hist.filter(
        (F.col("prev") < F.col("quota")) & (F.col("cum") > F.col("quota"))
    ).select(key_col, "_pfx", (F.col("quota") - F.col("prev")).alias("_take"))
    sel_full = base.join(F.broadcast(full), [key_col, "_pfx"], "left_semi")
    wb = W.partitionBy(key_col, "_pfx").orderBy("_sha", id_col)
    sel_boundary = (
        base.join(F.broadcast(boundary), [key_col, "_pfx"])
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= F.col("_take"))
    )
    return sel_full.select(key_col, id_col).unionByName(
        sel_boundary.select(key_col, id_col)
    )


#: Multiplicative-hash uniform in (0,1): Knuth's 2654435761 over the
#: 32-bit ring, +0.5 so u is never 0 or 1.  Pure BIGINT arithmetic —
#: bit-identical in Spark SQL and DuckDB, so the oracle can replay it.
_U01 = "((((doc_id % 4294967296) * 2654435761) % 4294967296) + 0.5) / 4294967296.0"


@register(
    "smp07_weighted_sample",
    f"""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               -ln({_U01}) / n_chars AS priority
        FROM documents WHERE n_chars > 0
    ) ORDER BY priority, doc_id LIMIT 100
    """,
    category="llm-sampling",
    doc=(
        "deterministic weighted sampling without replacement "
        "(Efraimidis-Spirakis exponential-clocks form): each doc draws "
        "u from a keyed multiplicative hash (never rand(), so re-runs "
        "and different parallelism pick the same rows), priority = "
        "-ln(u)/weight, global k smallest win — heavier docs "
        "(weight = n_chars) are proportionally likelier. Top-k is "
        "TakeOrdered (per-partition k then merge k*P at the driver), "
        "no global sort, no shuffle of the data."
    ),
)
def smp07_weighted_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.withColumn("priority", F.expr(f"-ln({_U01}) / n_chars"))
        .orderBy("priority", "doc_id")
        .limit(100)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "smp08_domain_mixture_resample",
    f"""
    WITH rated AS (
        SELECT doc_id, source,
               CASE WHEN source IN ('src0', 'src1') THEN 1.0
                    WHEN source IN ('src2', 'src3') THEN 0.5
                    ELSE 0.25 END AS rate
        FROM documents
    )
    SELECT source, CAST(MAX(rate) AS DOUBLE) AS rate,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN {_U01} < rate THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(MIN(CASE WHEN {_U01} < rate THEN doc_id END) AS BIGINT)
               AS first_sampled
    FROM rated GROUP BY source
    """,
    category="llm-sampling",
    doc=(
        "domain mixture resampling (training-mix control): each source "
        "gets a target acceptance rate — here a literal CASE; in "
        "production a solver-produced weights table broadcast onto the "
        "corpus — and rows are kept when the keyed-hash uniform "
        "u(doc_id) falls under the rate. Deterministic under re-runs "
        "and any partitioning (no rand()), single narrow scan + one "
        "map-side-combined aggregate; composing with smp05's "
        "temperature rates covers the count^alpha balancing family."
    ),
)
def smp08_domain_mixture_resample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin("src0", "src1"), F.lit(1.0))
        .when(F.col("source").isin("src2", "src3"), F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    u = F.expr(_U01)
    picked = u < F.col("rate")
    return (
        d.select("doc_id", "source", rate.alias("rate"))
        .groupBy("source")
        .agg(
            F.max("rate").cast("double").alias("rate"),
            F.count("*").alias("n_total"),
            F.sum(F.when(picked, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.min(F.when(picked, F.col("doc_id"))).cast("long").alias("first_sampled"),
        )
    )


@register(
    "smp09_length_bucket_stats",
    r"""
    WITH t AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_tok,
               CAST(CASE WHEN n_tok <= 16 THEN 16
                    ELSE power(2, ceil(log2(n_tok))) END AS BIGINT) AS bucket
        FROM t
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           ROUND(SUM(n_tok) / CAST(COUNT(*) * bucket AS DOUBLE), 6)
               AS pad_efficiency
    FROM b GROUP BY bucket
    """,
    category="llm-sampling",
    doc=(
        "sequence-length bucketing for training batches: docs binned to "
        "power-of-2 token-length buckets (min 16); per bucket, doc/token "
        "counts and padding efficiency (real tokens / padded tokens) — "
        "the quantity a batch scheduler maximizes. Length histogramming "
        "is a narrow map + one small aggregate at any corpus size; "
        "complements smp02's sequential packing (which removes padding "
        "by concatenation) with the bucketed-batching alternative."
    ),
)
def smp09_length_bucket_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = d.select("doc_id", n_tok.alias("n_tok"))
    bucket = (
        F.when(F.col("n_tok") <= 16, F.lit(16))
        .otherwise(F.pow(F.lit(2.0), F.ceil(F.log2("n_tok"))))
        .cast("bigint")
    )
    return (
        t.select("doc_id", "n_tok", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            (F.count("*") * F.col("bucket")).cast("bigint").alias("padded_tokens"),
            F.round(
                F.sum("n_tok") / (F.count("*") * F.col("bucket")).cast("double"), 6
            ).alias("pad_efficiency"),
        )
    )


@register(
    "smp10_dsir_importance",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS c_t FROM tok WHERE doc_id % 20 = 0 GROUP BY tok),
    cc AS (SELECT tok, COUNT(*) AS c_c FROM tok WHERE doc_id % 20 <> 0 GROUP BY tok),
    vocab AS (
        SELECT COALESCE(tc.tok, cc.tok) AS tok,
               COALESCE(c_t, 0) AS c_t, COALESCE(c_c, 0) AS c_c
        FROM tc FULL OUTER JOIN cc ON tc.tok = cc.tok
    ),
    tot AS (
        SELECT CAST(SUM(c_t) AS DOUBLE) AS n_t,
               CAST(SUM(c_c) AS DOUBLE) AS n_c,
               CAST(COUNT(*) AS DOUBLE) AS v
        FROM vocab
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(ROUND(LN((vb.c_t + 1) / (tot.n_t + tot.v))
                          - LN((vb.c_c + 1) / (tot.n_c + tot.v)), 6)
                    AS DECIMAL(18,6)) AS lw
        FROM tok t JOIN vocab vb USING (tok) CROSS JOIN tot
        WHERE t.doc_id % 20 <> 0
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lw) AS DOUBLE) AS log_weight
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, log_weight,
           PERCENT_RANK() OVER (ORDER BY log_weight DESC, doc_id ASC) <= 0.25
               AS selected
    FROM agg
    """,
    category="llm-sampling",
    doc=(
        "DSIR-style importance resampling (Xie et al. 2023): per-token "
        "log importance ln(p_target/p_corpus) from two Laplace-smoothed "
        "unigram models (target = doc_id %% 20 = 0 held-out domain), "
        "summed per document; top-25%% by weight selected. Per-token "
        "logs are rounded to 6 dp and summed as DECIMAL (t10's "
        "order-independence trick), so both engines agree bit-exactly. "
        "Scale: two token aggregates + one broadcastable vocabulary "
        "join; the top-25%% selection is a DISTRIBUTED exact "
        "percent_rank (range-partitioned sort + per-partition offsets, "
        "operators/windows.py::distributed_percent_rank) — never a "
        "single-partition global window."
    ),
)
def smp10_dsir_importance(spark, sf_dir):
    from .text import explode_tokens

    d = load_table(spark, sf_dir, "documents")
    tok = explode_tokens(d)
    tc = (
        tok.filter(F.col("doc_id") % 20 == 0)
        .groupBy("tok")
        .agg(F.count("*").alias("c_t"))
    )
    cc = (
        tok.filter(F.col("doc_id") % 20 != 0)
        .groupBy("tok")
        .agg(F.count("*").alias("c_c"))
    )
    vocab = (
        tc.join(cc, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_c", F.lit(0)).alias("c_c"),
        )
    )
    tot = vocab.agg(
        F.sum("c_t").cast("double").alias("n_t"),
        F.sum("c_c").cast("double").alias("n_c"),
        F.count("*").cast("double").alias("v"),
    )
    lw = F.round(
        F.log((F.col("c_t") + 1) / (F.col("n_t") + F.col("v")))
        - F.log((F.col("c_c") + 1) / (F.col("n_c") + F.col("v"))),
        6,
    ).cast("decimal(18,6)")
    # salted (r9): probe side is every token occurrence of the candidate
    # corpus — Zipfian-hot keys on a join AQE cannot skew-split (the
    # full-outer vocab build aggregates above its shuffle; t27 probe).
    # vocab is key-collapsed, so 8x replication stays vocabulary-scale.
    from ..operators.skew import salted_join

    scored = (
        salted_join(tok.filter(F.col("doc_id") % 20 != 0), vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lw.alias("lw"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("lw").cast("double").alias("log_weight"),
    )
    from ..operators.windows import distributed_percent_rank

    # distributed-exact selection: the former unpartitioned
    # percent_rank window funneled one row PER DOCUMENT through a
    # single task — the 100 TB cliff this round removed
    ranked = distributed_percent_rank(
        agg, [F.col("log_weight").desc(), F.col("doc_id").asc()]
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "log_weight",
        (F.col("pr") <= 0.25).alias("selected"),
    )


@register(
    "smp11_epoch_shuffle",
    """
    SELECT doc_id, epoch,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch
               ORDER BY sha256(CAST(doc_id AS VARCHAR) || ':' ||
                               CAST(epoch AS VARCHAR)), doc_id
           ) AS BIGINT) AS position
    FROM documents
    CROSS JOIN (VALUES (0), (1), (2)) e(epoch)
    """,
    category="llm-sampling",
    doc=(
        "deterministic per-epoch training-order shuffle: position = rank "
        "of sha256(doc_id:epoch) — a different but REPRODUCIBLE "
        "permutation each epoch, stable under re-ingest, repartitioning, "
        "and engine choice (no RNG state to coordinate across 1000 "
        "executors). The global rank shown here is the oracle-checkable "
        "form; at 100 TB you sort by the same hash WITHIN each output "
        "shard (repartitionByRange on the hash + sortWithinPartitions), "
        "which needs no global window."
    ),
)
def smp11_epoch_shuffle(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = d.sparkSession.range(3).select(
        F.col("id").cast("int").alias("epoch")
    )
    keyed = d.crossJoin(F.broadcast(epochs)).withColumn(
        "_h",
        F.sha2(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("epoch").cast("string"),
            ),
            256,
        ),
    )
    w = W.partitionBy("epoch").orderBy("_h", "doc_id")
    return keyed.select(
        "doc_id",
        "epoch",
        F.row_number().over(w).cast("long").alias("position"),
    )


@register(
    "smp13_token_budget_fill",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               n_chars / CAST(len(regexp_split_to_array(trim(text), '\s+'))
                         AS DOUBLE) AS quality
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id ASC
                                ROWS UNBOUNDED PRECEDING) AS cum_tok
        FROM t
    )
    SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_tok AS BIGINT) AS cum_tok
    FROM c WHERE cum_tok <= 2000
    """,
    category="llm-sampling",
    doc=(
        "token-budget fill (training-mix construction): each source "
        "domain contributes its highest-quality documents until a fixed "
        "per-domain token budget (2000) is exhausted — greedy by a "
        "deterministic quality proxy (mean word length), doc_id "
        "tie-break, cumulative token sum over a per-domain window. The "
        "complement of smp08's rate-based mixing: budgets are absolute "
        "token counts (what a training run actually provisions), not "
        "acceptance rates. Scale: one shuffle on the domain key, then a "
        "single sorted pass per domain; a domain too large for one "
        "partition takes the distributed_percent_rank recipe (range-"
        "partition by quality, per-partition offsets) since the cumsum "
        "only needs partition-prefix totals, not a global sort."
    ),
)
def smp13_token_budget_fill(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = d.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        (F.col("n_chars") / n_tok.cast("double")).alias("quality"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= 2000)
        .select(
            "source",
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("cum_tok").cast("long").alias("cum_tok"),
        )
    )
