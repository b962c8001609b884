"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.2 "LLM-pipeline extensions").

All hot paths are JVM-side expressions (xxhash64 / array transforms /
aggregates) — no Python UDFs. The MinHash pipeline is the scale path:
signatures are computed per-row with zero shuffles (array_min over a
transform), banding turns the O(n²) pair problem into a
groupBy(band_hash) bucket join, and only bucket-collided candidates get
the exact-Jaccard verification. This is the standard shingle → minhash →
band → bucket-join construction; at 100 TB the band shuffle is the only
wide dependency and is keyed on (band_idx, band_hash) which is uniform
by construction.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table, spread_scan
from .text import whitespace_tokens

# ---------------------------------------------------------------------------
# building blocks (engine API, reusable on any DataFrame)
# ---------------------------------------------------------------------------


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles; whole text if shorter than n words.

    NOTE: inlines split() into every element access — fine inside a
    single projection of short rows, but for hot paths prefer
    ``shingles_from_words`` over a pre-materialized words column
    (repeated split() re-evaluation measured ~10× slower on long docs).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return shingles_from_words(F.split(c, " "), n)


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an (ideally pre-materialized) words array."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.when(F.size(w) < n, F.array(F.concat_ws(" ", w))).otherwise(grams)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 64
) -> DataFrame:
    """k min-hashes per row: h_i = min over shingles of xxhash64(s, i).

    Shingles are exploded once and reduced with k MIN aggregates —
    map-side partial aggregation collapses each partition to one row per
    doc before the shuffle, so the wide stage moves O(#docs · k) longs
    regardless of document length. (The tempting alternative — k
    ``array_min(transform(...))`` expressions per row — re-evaluates the
    shingle array k times and blows codegen up; measured ~100× slower.)

    Hash family: two-hash construction h_i(s) = h1(s) XOR rotl(h2(s), i)
    — two real xxhash64 evaluations per shingle, k derived by bitwise
    rotate+xor (wrap-free under ANSI mode; ~3× cheaper on the scan stage
    than k independent xxhash64 calls, same minhash quality in the
    recall tests).
    """
    # (spread_scan deliberately NOT applied here: the k-MIN aggregate
    # collapses map-side, so the single-task pass is already ~0.5 s and
    # a repartition costs more than it saves — A/B-measured)
    sh = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_w"))
        .select(F.col(id_col), F.explode(shingles_from_words(F.col("_w"))).alias("_sh"))
        .select(
            id_col,
            F.xxhash64("_sh", F.lit(1)).alias("_h1"),
            F.xxhash64("_sh", F.lit(2)).alias("_h2"),
        )
    )
    def rotl(c, i: int):
        if i % 64 == 0:
            return c
        return F.shiftleft(c, i % 64).bitwiseOR(F.shiftrightunsigned(c, 64 - i % 64))

    aggs = [
        F.min(F.col("_h1").bitwiseXOR(rotl(F.col("_h2"), i))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _rep_signatures(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Signatures for one min-id representative per distinct text, in ONE
    shuffle: shingle rows are grouped by sha2(text) ALONE — identical
    copies contribute identical (shingle-hash) rows, MIN aggregates are
    idempotent across them, and min(id) picks the representative in the
    same aggregation. No text shuffle, no second rep-selection stage."""
    sha = F.sha2(F.col(text_col), 256)
    sh = (
        docs.select(
            F.col(id_col),
            sha.alias("_sha"),
            F.split(F.col(text_col), " ").alias("_w"),
        )
        .select(
            F.col(id_col),
            "_sha",
            F.explode(shingles_from_words(F.col("_w"))).alias("_s"),
        )
        .select(
            id_col,
            "_sha",
            F.xxhash64("_s", F.lit(1)).alias("_h1"),
            F.xxhash64("_s", F.lit(2)).alias("_h2"),
        )
    )

    def rotl(c, i: int):
        if i % 64 == 0:
            return c
        return F.shiftleft(c, i % 64).bitwiseOR(F.shiftrightunsigned(c, 64 - i % 64))

    aggs = [
        F.min(F.col("_h1").bitwiseXOR(rotl(F.col("_h2"), i))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh.groupBy("_sha").agg(F.min(id_col).alias(id_col), *aggs).drop("_sha")


def bands_from_signatures(
    sig: DataFrame, id_col: str, k: int = 64, bands: int = 16
) -> DataFrame:
    """(band_idx, band_hash) rows from a signature table (h0..h{k-1})."""
    rows = k // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(*[F.col(f"h{b * rows + j}") for j in range(rows)]).alias(
                    "band_hash"
                ),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_cols).alias("band")).select(
        id_col,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_hash").alias("band_hash"),
    )


def with_minhash_bands(
    df: DataFrame, id_col: str, text_col: str, k: int = 64, bands: int = 16
) -> DataFrame:
    """Attach (band_idx, band_hash) rows: one output row per band per doc."""
    return bands_from_signatures(minhash_signatures(df, id_col, text_col, k), id_col, k, bands)


def exact_jaccard(a_tokens: Column, b_tokens: Column) -> Column:
    """Jaccard of two distinct-token arrays (JVM-side)."""
    inter = F.size(F.array_intersect(a_tokens, b_tokens)).cast("double")
    union = (
        F.size(a_tokens).cast("double") + F.size(b_tokens).cast("double") - inter
    )
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def collapse_exact_duplicates(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One representative row (minimum id) per distinct text.

    Grouped on sha2(text) so the exchange/sort comparator works on a
    64-char key instead of whole documents; every row in a group carries
    the identical text, so ``first(text)`` is deterministic."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("_sha"))
        .agg(
            F.min(id_col).alias(id_col),
            F.first(text_col).alias(text_col),
        )
        .drop("_sha")
    )


def near_dup_pairs_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    bucket_cap: int = 200,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    exact-collapse → shingle → minhash → band → bucket-join → verify.
    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold, over one representative (minimum id) per distinct text.

    Two scale guards make the bucket expansion safe at 100 TB:

    - **Exact duplicates are collapsed first.** Web corpora are dominated
      by byte-identical copies; without the collapse every copy of a hot
      page lands in the same LSH bucket and the pair expansion is
      O(copies²). Identical-text duplicates are the exact-dedup
      operators' domain (d01/d02 emit the groups); this operator reports
      *near* duplicates among distinct texts.
    - **Deterministic bucket cap.** Genuinely-colliding buckets are tiny
      (64-bit band hashes), but a cap bounds the worst case: each bucket
      keeps its ``bucket_cap`` smallest ids (sorted slice — visible in
      the plan), so pair expansion is ≤ cap² regardless of skew.

    The collapse is free: shingle rows group by sha2(text) directly
    (``_rep_signatures``) — one shuffle of 64-byte keyed rows computes
    both the representative (min id) and its signature; text never
    shuffles. Token arrays for exact verification are fetched from the
    original scan by candidate id — candidates are few, so AQE
    broadcasts them.
    """
    # spread_scan: BOTH corpus passes (the signature fold and the
    # verify-side shingle projection) are CPU-bound per row; on a
    # sub-core-count single-file scan each ran as ONE task (profiled
    # 0.8 s + 1.6 s at sf0.1). The earlier A/B that rejected a
    # repartition measured only the signature pass — spreading the
    # shared input pays for itself across the two passes. No-op at
    # scale (multi-file inputs already exceed the core count).
    #
    # DISK_ONLY persist (r14, guide §5 caching-for-reuse, the d07 base
    # discipline): the two passes are separate jobs, so the scan +
    # spread exchange executed TWICE per call (profiled as two identical
    # 850 KB exchange writes). One row per doc, corpus-linear,
    # recomputable; janitor lifetime (release_cached_state between
    # queries), same contract as jaccard_pairs_prefix.
    #
    # Persist the (id, text) PROJECTION, not the raw frame (guide §2.3
    # — these are the only columns the operator touches — and a
    # correctness guard: when spread_scan no-ops, persisting the bare
    # table scan would let CacheManager substitute the cached FULL-width
    # relation into every later same-session query over the table,
    # silently defeating their column pruning — caught by
    # test_smp06_hash_split_narrow running after a d04 test).
    from pyspark.storagelevel import StorageLevel

    docs = spread_scan(docs.select(id_col, text_col), id_col).persist(
        StorageLevel.DISK_ONLY
    )
    b = bands_from_signatures(_rep_signatures(docs, id_col, text_col, k), id_col, k, bands)
    # candidate pairs bucket-locally: group each (band, hash) bucket and
    # expand pairs inside it. One aggregation instead of a second scan +
    # self-join of the signature table.
    buckets = (
        b.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("all_ids"))
        .filter(F.size("all_ids") > 1)
        .select(F.slice("all_ids", 1, bucket_cap).alias("ids"))
    )
    cand = (
        buckets.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    # verify on the SAME set the minhash estimates: distinct word
    # 3-gram shingles. (Until r7 this verified distinct-TOKEN jaccard,
    # which is a different — and far more permissive — measure: on the
    # test corpus 65k of 125k doc pairs clear 0.6 token overlap while
    # only ~28 share 60% of their shingles. The estimator and the
    # verifier must speak the same language or the threshold is
    # meaningless; APPROX_CHECKS d04 pins the agreement.)
    #
    # The shingle projection runs corpus-wide ON PURPOSE: it fuses into
    # the verify-side scan (map-only, linear, no shuffle). The tempting
    # alternative — semi-join-pruning this side to candidate ids first —
    # re-executes the band-bucket aggregation (the operator's heaviest
    # shuffle) a second time to derive the id set, which is the worse
    # trade at every scale; measured equal at sf0.1 (2.8 vs 2.9 s) and
    # strictly worse at 100 TB where the doubled shuffle dominates.
    toks = docs.select(
        F.col(id_col),
        F.array_distinct(
            shingles_from_words(F.split(F.col(text_col), " "))
        ).alias("toks"),
    )
    verified = (
        cand.join(toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("ta")), "id_a")
        .join(toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("tb")), "id_b")
        .withColumn("jaccard", F.round(exact_jaccard(F.col("ta"), F.col("tb")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def lsh_bucket_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    bucket_cap: int = 200,
) -> DataFrame:
    """Diagnostic: LSH bucket-size distribution and cap overflow.

    One row: (n_buckets, max_bucket, n_capped, overflow_ids) — run it
    alongside a production dedup job to see what the cap dropped."""
    b = bands_from_signatures(_rep_signatures(docs, id_col, text_col, k), id_col, k, bands)
    sizes = b.groupBy("band_idx", "band_hash").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.when(F.col("sz") > bucket_cap, 1).otherwise(0)).alias("n_capped"),
        F.sum(
            F.when(F.col("sz") > bucket_cap, F.col("sz") - bucket_cap).otherwise(0)
        ).alias("overflow_ids"),
    )


def simhash64(text_col: str | Column) -> Column:
    """64-bit SimHash over word tokens, pure JVM expression.

    Per bit b: vote = Σ_tokens (bit_b(xxhash64(token)) ? +1 : -1);
    simhash bit b = vote > 0.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    # per-bit vote: Σ over tokens of ±1 (shift amounts must be literals,
    # so the 64 bits are unrolled — still one codegen'd expression tree)
    def _vote_fn(b: int):
        # pyspark introspects lambda arity — bind b via closure, not a
        # default arg
        def fn(acc, t):
            sign = F.when(
                F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
            return acc + sign

        return fn

    out = F.lit(0).cast("long")
    for b in range(64):
        vote = F.aggregate(toks, F.lit(0), _vote_fn(b))
        bitval = (1 << b) if b < 63 else -(1 << 63)  # signed top bit
        out = out + F.when(vote > 0, F.lit(bitval).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_from_token_hashes(
    toks: DataFrame, id_col: str, hash_col: str = "_h", n_bits: int = 64
) -> DataFrame:
    """The SimHash vote→bits fold over pre-hashed (id, token-hash) rows:
    per bit b the vote is Σ ±1 over the low ``n_bits`` of the token
    hash; fingerprint bit b = vote > 0. ONE groupBy with ``n_bits`` SUM
    aggregates — map-side partial aggregation collapses each partition
    to one row per doc before the shuffle.

    This is THE production machinery (d05/d08 call it with xxhash64
    token hashes, n_bits=64) and the d20 oracle-audit machinery (sha256-
    derived 40-bit token hashes) — one code path, so the audit's strict
    hash-green row covers the pipeline d05/d08 run (VERDICT r11 item 1).
    """
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(hash_col), b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    out = F.lit(0).cast("long")
    for b in range(n_bits):
        bitval = (1 << b) if b < 63 else -(1 << 63)  # signed top bit
        out = out + F.when(F.col(f"v{b}") > 0, F.lit(bitval).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select(F.col(id_col), out.alias("simhash"))


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """64-bit SimHash per row via explode → per-bit vote aggregation.

    Semantically identical to ``simhash64`` (same hash, same votes,
    same tie-breaks) but tokens are hashed ONCE and the 64 bit-votes are
    64 SUM aggregates over the exploded token rows — map-side partial
    aggregation collapses each partition to one row per doc before the
    shuffle, exactly like ``minhash_signatures``. The per-row expression
    variant re-walks the token array 64 times inside one projection;
    measured ~4× slower on the documents table and its codegen grows
    with 64 nested array passes.
    """
    # (spread_scan deliberately NOT applied: the 64 bit-vote SUMs
    # collapse map-side — same A/B result as minhash_signatures)
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).select(id_col, F.xxhash64("_t").alias("_h"))
    return simhash_from_token_hashes(toks, id_col, "_h", 64)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


@register(
    "d01_exact_dedup_keep_first",
    """
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn = 1
    """,
    category="llm-dedup",
    doc="exact dedup, keep lowest doc_id per identical text (window, no collect).",
)
def d01_exact_dedup_keep_first(spark, sf_dir):
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@register(
    "d02_exact_dedup_hash_groups",
    """
    SELECT sha256(text) AS text_sha, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper
    FROM documents
    GROUP BY text_sha
    """,
    category="llm-dedup",
    doc="content-hash groups: sha256(text) ↔ Spark sha2; duplicate multiplicity.",
)
def d02_exact_dedup_hash_groups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2(F.col("text"), 256).alias("text_sha")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper")
    )


@register(
    "d03_ngram_jaccard_pairs",
    """
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS grams
        FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 2
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6)
             AS jaccard
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND b.n_chars BETWEEN a.n_chars - 2 AND a.n_chars + 2
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.2
    """,
    category="llm-dedup",
    doc="exact word-bigram Jaccard over blocked candidate pairs (lang + length blocking).",
)
def d03_ngram_jaccard_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # grams travel as xxhash64 ints, not strings: the blocked join
    # shuffles every gram array 3× (probe-bucket replication), and
    # array_intersect compares elements pair-wise — 8-byte longs cut both
    # the shuffle bytes and the compare cost vs ~20-byte strings while
    # leaving the Jaccard value bit-identical to the string-gram oracle
    # (hashing is injective on a corpus's distinct grams up to 2^-64
    # collisions; the distinct-set SIZES are what the formula uses)
    # spread_scan: gram hashing is CPU-bound per row — parallelize the
    # sub-core-count single-file scan; no-op at scale
    t = (
        spread_scan(d, "doc_id")
        .withColumn("w", F.split("text", " "))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.array_distinct(
                F.transform(shingles_from_words(F.col("w"), 2), lambda g: F.xxhash64(g))
            ).alias("grams"),
        )
        # both join sides derive from t: persist so shingling runs
        # once, not once per side (30% off the whole query; the
        # materialized frame is one row per doc — corpus-linear, not
        # pair-quadratic). Recomputable DISK_ONLY persist, NOT
        # localCheckpoint: a checkpoint severs lineage, so on a real
        # cluster a lost executor mid-join would kill the query with no
        # recompute path (VERDICT r8).
        .persist(StorageLevel.DISK_ONLY)
    )
    # Length-bucket blocking: bucket = n_chars div 5; |Δn_chars| ≤ 2 means
    # the partner's bucket is within ±1, so probing 3 buckets per left row
    # gives a *granular equi-join key* (lang, bucket). Joining on lang
    # alone (5 distinct keys) serializes the cluster; (lang, bucket) keys
    # scale with the data. Each (a,b) pair meets exactly once because b's
    # own bucket is unique.
    bucket = (F.col("n_chars") / 5).cast("long")
    a = (
        t.withColumn("probe_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1)))
        .select(
            F.col("doc_id").alias("id_a"),
            F.col("lang").alias("lang_a"),
            F.col("n_chars").alias("nc_a"),
            F.col("grams").alias("ga"),
            "probe_bucket",
        )
    )
    b = t.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("nc_b"),
        F.col("grams").alias("gb"),
        bucket.alias("bucket_b"),
    )
    jac = exact_jaccard(F.col("ga"), F.col("gb"))
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("probe_bucket") == F.col("bucket_b"))
            & (F.col("id_a") < F.col("id_b"))
            & F.col("nc_b").between(F.col("nc_a") - 2, F.col("nc_a") + 2),
        )
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", "jaccard")
    )


@register(
    "d04_minhash_near_dups",
    None,  # banding uses xxhash64 (no DuckDB equivalent); exact-verify is tested in pytest
    category="llm-dedup",
    doc="MinHash+LSH near-dup pairs (k=64, 16 bands), exact-Jaccard verified ≥0.6.",
)
def d04_minhash_near_dups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return near_dup_pairs_minhash(d, "doc_id", "text", k=64, bands=16, threshold=0.6)


@register(
    "d05_simhash_fingerprints",
    None,  # xxhash64-based; properties tested in pytest
    category="llm-dedup",
    doc="64-bit SimHash per document (pure JVM expression; Hamming-bucket near-dup basis).",
)
def d05_simhash_fingerprints(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(d, "doc_id", "text")


def pigeonhole_bands(
    sh: DataFrame, id_col: str, fp_col: str, n_bits: int, n_bands: int
) -> DataFrame:
    """Band a single-long fingerprint into ``n_bands`` pigeonhole blocks
    (Manku, Jain & Das Sarma WWW'07): uneven widths cover all ``n_bits``
    (e.g. 64/9 → eight 7-bit + one 8-bit), and a pair within Hamming
    distance < n_bands matches at least one block exactly. Shared by
    the production d08 path and the d20 sha-audit (one code path).

    Returns (id, fp, band_idx, band_val) rows, ``n_bands`` per input.
    """
    base, extra = divmod(n_bits, n_bands)
    widths = [base + 1] * extra + [base] * (n_bands - extra)
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col(fp_col), offsets[b])
                .bitwiseAND(F.lit((1 << widths[b]) - 1))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    return sh.select(id_col, fp_col, F.explode(blocks).alias("b")).select(
        id_col,
        fp_col,
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )


def capped_fingerprint_band_pairs(
    banded: DataFrame,
    fp_col: str,
    id_col: str,
    bucket_cap: int,
) -> DataFrame:
    """Candidate pairs from (band_idx, band_val, id, fingerprint) rows via
    capped in-bucket expansion — the d04 bucket-cap recipe applied to
    single-long fingerprint families (SimHash, perceptual hash).

    Each (band, value) bucket keeps its ``bucket_cap`` smallest members,
    so pair expansion is bounded by cap² per bucket REGARDLESS of skew —
    the hot-fingerprint case (mass near-identical pages, all-zero hashes
    from empty payloads) degrades to bounded recall instead of an
    O(bucket²) executor blow-up. The cap is applied with a row_number
    window BEFORE the collect_list, so a pathological mass-duplicate
    fingerprint never materializes more than ``bucket_cap`` structs in
    any aggregation buffer (r8: the previous sort-then-slice capped the
    pairs but still buffered the whole hot bucket in one task). The
    window and the groupBy share the (band_idx, band_val) hash
    partitioning, so Catalyst plans ONE Exchange for both. Pairs
    colliding in several bands collapse with a distinct over four
    scalar columns.

    Returns (id_a, id_b, fp_a, fp_b) with id_a < id_b; callers verify
    with the exact popcount.
    """
    w = Window.partitionBy("band_idx", "band_val").orderBy(F.col(id_col))
    buckets = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= bucket_cap)
        .groupBy("band_idx", "band_val")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col(fp_col).alias("f"))
            ).alias("mem")
        )
        .filter(F.size("mem") > 1)
        .select("mem")
    )
    return (
        buckets.select(F.explode("mem").alias("a"), "mem")
        .select("a", F.explode("mem").alias("b"))
        .filter(F.col("a.i") < F.col("b.i"))
        .select(
            F.col("a.i").alias("id_a"),
            F.col("b.i").alias("id_b"),
            F.col("a.f").alias("fp_a"),
            F.col("b.f").alias("fp_b"),
        )
        .distinct()
    )


def near_dup_pairs_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    bucket_cap: int = 4096,
) -> DataFrame:
    """SimHash near-dup pairs with a pigeonhole-guaranteed radius.

    The 64-bit fingerprint is banded into ``max_hamming + 1`` blocks
    (Manku, Jain & Das Sarma, WWW'07 block-permuted construction): a
    pair within Hamming distance ≤ max_hamming differs in fewer bits
    than there are blocks, so at least one block matches exactly and
    the candidate equi-join surfaces the pair — candidate recall at the
    advertised radius is 1.0 by construction, not probabilistic (r8:
    the previous 4×16 banding only guaranteed ≤3 and measured 0.41
    recall at the documented ≤8; same fix m06 shipped in r7).

    Scale tradeoff made explicit: 9 blocks over 64 bits leave ~7-bit
    band values (128 distinct join keys per band), so bucket occupancy
    grows linearly with corpus size and pair expansion quadratically.
    ``bucket_cap`` bounds that with deterministic smallest-id retention
    (capped BEFORE aggregation — bounded task memory), degrading to
    recorded partial recall instead of an executor blow-up; at true
    100 TB scale callers should either shrink the radius (wider bands)
    or pre-partition by a content key. Candidates are verified with the
    exact popcount, so precision is always exact."""
    sh = simhash_fingerprints(docs, id_col, text_col).select(
        F.col(id_col), F.col("simhash").alias("_sh")
    )
    banded = pigeonhole_bands(sh, id_col, "_sh", 64, max_hamming + 1)
    pairs = capped_fingerprint_band_pairs(banded, "_sh", id_col, bucket_cap)
    return (
        pairs.select(
            "id_a", "id_b", hamming64(F.col("fp_a"), F.col("fp_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )


@register(
    "d08_simhash_near_dups",
    None,  # xxhash64-based fingerprints — property-tested in pytest
    category="llm-dedup",
    doc="SimHash banded near-dup pairs (9 uneven blocks over 64 bits; pigeonhole-guaranteed candidate recall across the whole advertised Hamming <= 8 radius; exact popcount verify).",
)
def d08_simhash_near_dups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return near_dup_pairs_simhash(d, "doc_id", "text", max_hamming=8)


@register(
    "d06_embedding_near_dups",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 25 = 0)
    SELECT q.vec_id AS id_a, e.vec_id AS id_b,
           ROUND(list_dot_product(q.v, e.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6)
             AS cosine
    FROM q JOIN e ON q.label = e.label AND q.vec_id < e.vec_id
    WHERE list_dot_product(q.v, e.v)
          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) >= 0.9
    """,
    category="llm-dedup",
    doc="embedding-cosine near-dup: label-blocked exact pairs ≥0.9 for sampled probes.",
)
def d06_embedding_near_dups(spark, sf_dir):
    from .similarity import cosine_sim, to_double_array

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"), F.col("v").alias("va")
    )
    r = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("v").alias("vb")
    )
    cos = cosine_sim(F.col("va"), F.col("vb"))
    return (
        q.join(r, (F.col("label_a") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
        .filter(cos >= 0.9)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


#: Deterministic raw-URL synthesis (documents have no URL column): mixed
#: host case, optional trailing slash, three tracking-param variants and
#: an optional fragment — every messy form a crawler actually sees.  The
#: expression is the ENGINE-SHARED part: plain SQL valid in both Spark
#: and DuckDB, so the oracle replays byte-identical input.
_RAW_URL_SQL = """concat(
    CASE WHEN doc_id % 2 = 0 THEN 'https://WWW.Example.com'
         ELSE 'https://www.example.com' END,
    '/', source, '/page-', CAST(doc_id % 50 AS STRING),
    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
    CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&utm_campaign=c1'
                    WHEN 1 THEN '?ref=tw&utm_medium=social'
                    WHEN 2 THEN '?id=7&utm_source=mail'
                    ELSE '' END,
    CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
)"""


def canonicalize_url(url: Column) -> Column:
    """Crawler-style URL canonicalization, all JVM-side regex (no UDF):
    drop fragment, lowercase scheme+authority, strip tracking params
    (utm_*, ref), tidy separator debris, drop the trailing slash."""
    u = F.regexp_replace(url, "#.*", "")
    prefix = F.regexp_extract(u, "^https?://[^/]*", 0)
    u = F.concat(
        F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.lit(1 << 30))
    )
    u = F.regexp_replace(u, r"(utm_[a-z]+|ref)=[^&#]*&?", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"/\?", "?")
    u = F.regexp_replace(u, r"/$", "")
    return u


@register(
    "d12_url_canonical_dedup",
    f"""
    WITH raw AS (
        SELECT doc_id, {_RAW_URL_SQL} AS raw_url FROM documents
    ), canon AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   lower(regexp_extract(u, '^https?://[^/]*', 0))
                   || substr(u, length(regexp_extract(u, '^https?://[^/]*', 0)) + 1),
                   '(utm_[a-z]+|ref)=[^&#]*&?', '', 'g'),
                   '[?&]$', ''), '/\\?', '?'), '/$', '') AS canonical_url
        FROM (SELECT doc_id, regexp_replace(raw_url, '#.*', '') AS u FROM raw)
    )
    SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM canon GROUP BY canonical_url
    """,
    category="llm-dedup",
    doc=(
        "URL canonicalization + dedup (the Common-Crawl first pass): "
        "fragment stripped, scheme+host lowercased, utm_*/ref tracking "
        "params removed, separator debris and trailing slash tidied, "
        "then exact group-by on the canonical form keeping min(doc_id). "
        "All JVM regex expressions in the scan stage — no UDF, no extra "
        "shuffle beyond the final group-by; at 100 TB this is a "
        "map-side-combined aggregation on the canonical key."
    ),
)
def d12_url_canonical_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_RAW_URL_SQL).alias("raw_url")
    )
    return (
        d.select("doc_id", canonicalize_url(F.col("raw_url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_dups"),
        )
    )


@register(
    "d13_near_dup_keep_list",
    None,  # MinHash-candidate-based (declared-approximate family); property-tested
    category="llm-dedup",
    doc=(
        "end-to-end near-dedup (the operator a production corpus run "
        "actually executes): MinHash+LSH pairs (d04's capped bucket "
        "construction) feed connected components (d10's pointer-jumping "
        "min-label propagation), every document keeps its cluster's "
        "minimum id, and the keep-list is (doc_id, cluster_rep, keep). "
        "Transitive near-dups collapse to ONE survivor per cluster — "
        "pairwise dropping would keep chains alive. Composition of two "
        "verified scale shapes; no new shuffle beyond theirs."
    ),
)
def d13_near_dup_keep_list(spark, sf_dir):
    from .graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    comp = connected_components(pairs, "id_a", "id_b")
    out = docs.select("doc_id").join(
        comp.select(F.col("node").alias("doc_id"), F.col("component")),
        "doc_id",
        "left",
    )
    rep = F.coalesce(F.col("component"), F.col("doc_id"))
    return out.select(
        "doc_id",
        rep.alias("cluster_rep"),
        (rep == F.col("doc_id")).alias("keep"),
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 10
) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    maximal regions of each document whose every ``n``-token window also
    occurs in some other document, and report per-document duplicated
    token mass.

    Re-expressed relationally instead of via a suffix array: (1) every
    n-gram start position hashes to a long; (2) a two-phase aggregate
    keeps grams seen in >=2 distinct documents (cross-document repeats —
    the training-data leakage case); (3) the duplicated start positions
    join back; (4) per document, overlapping/adjacent windows merge into
    maximal islands with one LAG + running-sum window (gaps-and-islands:
    a new island starts where pos - prev_pos > n), and each island
    covers max_pos - min_pos + n tokens (capped at doc length for the
    short-doc whole-text shingle).

    Scale: the gram aggregate is O(1) state per key and map-side
    combined; the island merge shuffles only the DUPLICATED starts (a
    small fraction of corpus tokens) once on the doc key. No suffix
    array, no sort of the corpus — the 100 TB-friendly approximation
    that is exact for cross-document duplication at n-token resolution.

    Returns (id, n_tokens, n_islands, dup_tokens, dup_ratio)."""
    w = df.select(
        F.col(id_col), whitespace_tokens(text_col).alias("_w")
    ).select(
        id_col,
        F.size("_w").alias("n_tokens"),
        F.posexplode(shingles_from_words(F.col("_w"), n)).alias("pos", "_g"),
    )
    starts = w.select(
        id_col, "n_tokens", "pos", F.xxhash64("_g").alias("gram")
    )
    dup_grams = (
        starts.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("gram")
    )
    # salted (r9): a boilerplate 10-gram's every occurrence is a hot
    # probe key on a join AQE cannot skew-split (the dup-gram filter
    # aggregates above its shuffle; the t27 probe). dup_grams is
    # key-collapsed, so the 8x replication is duplicated-vocab-sized.
    from ..operators.skew import salted_join

    dup_starts = salted_join(starts, dup_grams, "gram").select(
        id_col, "n_tokens", "pos"
    )
    ord_w = Window.partitionBy(id_col).orderBy("pos")
    run_w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = (
        dup_starts.withColumn("_prev", F.lag("pos").over(ord_w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > n),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("_brk").over(run_w))
    )
    per_island = islands.groupBy(id_col, "n_tokens", "island").agg(
        (
            F.least(F.max("pos") + n, F.col("n_tokens")) - F.min("pos")
        ).alias("span_tokens")
    )
    return per_island.groupBy(id_col, "n_tokens").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
        F.round(
            F.sum("span_tokens") / F.col("n_tokens").cast("double"), 6
        ).alias("dup_ratio"),
    ).select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_islands",
        "dup_tokens",
        "dup_ratio",
    )


@register(
    "d15_duplicate_spans",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    s AS (
        SELECT doc_id, len(words) AS n_tokens, g.pos, g.gram
        FROM w CROSS JOIN LATERAL (
            SELECT CASE WHEN len(words) < 10
                        THEN [array_to_string(words, ' ')]
                        ELSE [array_to_string(words[(i+1):(i+10)], ' ')
                              for i in range(len(words)-9)] END AS grams
        ) t CROSS JOIN LATERAL (
            SELECT unnest(range(len(t.grams))) AS pos,
                   unnest(t.grams) AS gram
        ) g
    ),
    dup AS (
        SELECT gram FROM s GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
    ),
    ds AS (
        SELECT s.doc_id, s.n_tokens, s.pos
        FROM s JOIN dup USING (gram)
    ),
    brk AS (
        SELECT doc_id, n_tokens, pos,
               CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         IS NULL
                    OR pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         > 10
                    THEN 1 ELSE 0 END AS b
        FROM ds
    ),
    isl AS (
        SELECT doc_id, n_tokens, pos,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM brk
    ),
    per_island AS (
        SELECT doc_id, n_tokens, island,
               least(MAX(pos) + 10, n_tokens) - MIN(pos) AS span_tokens
        FROM isl GROUP BY doc_id, n_tokens, island
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
           ROUND(SUM(span_tokens) / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio
    FROM per_island GROUP BY doc_id, n_tokens
    """,
    category="llm-dedup",
    doc=(
        "ExactSubstr-style duplicated-span accounting: maximal islands "
        "of 10-token windows shared with other documents, merged with "
        "one gaps-and-islands window over only the duplicated starts; "
        "per-doc duplicated token mass and ratio. The relational "
        "re-expression of suffix-array substring dedup."
    ),
)
def d15_duplicate_spans(spark, sf_dir):
    # spread_scan: the gram-position explode runs twice (dup-gram agg +
    # salted probe) and each pass was single-task (r13 profile); no-op
    # at scale
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return duplicate_spans(d, "doc_id", "text", n=10)


def char_shingles(text: Column, n: int = 5, stride: int | None = None) -> Column:
    """Distinct character n-gram shingles — the tokenizer-free unit for
    scripts without whitespace word boundaries (CJK, Thai) where word
    shingles (d03/d04) don't exist. Short texts fall back to one
    whole-text shingle.

    ``stride`` is the recall/cost dial: 1 = textbook overlapping
    shingles (n× larger gram sets — measured ~5x slower end-to-end in
    the d16 pair join at n=5); ``stride=n`` (the default) = disjoint
    blocks, the t14-style unit that keeps gram sets |text|/n."""
    if stride is None:
        stride = n
    t = F.trim(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.ceil((F.length(t) - n + 1) / stride) - 1),
        lambda i: t.substr(i * stride + 1, F.lit(n)),
    )
    return F.array_distinct(
        F.when(F.length(t) < n, F.array(t)).otherwise(grams)
    )


@register(
    "d16_char_jaccard_pairs",
    r"""
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               list_distinct(CASE WHEN strlen(trim(text)) < 5
                    THEN [trim(text)]
                    ELSE [substr(trim(text), i*5+1, 5)
                          FOR i IN range(CAST(ceil((strlen(trim(text)) - 4) / 5.0) AS BIGINT))] END) AS grams
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6)
             AS jaccard
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND b.n_chars BETWEEN a.n_chars - 2 AND a.n_chars + 2
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.2
    """,
    category="llm-dedup",
    doc=(
        "character 5-gram-block Jaccard over the same (lang, length-bucket) "
        "blocked pair join as d03 — the tokenizer-free dedup path for "
        "scripts without whitespace word boundaries, where word-shingle "
        "MinHash/Jaccard has no unit to work with. Grams travel as "
        "xxhash64 longs; same probe-bucket replication, same "
        "granular-key scale argument."
    ),
)
def d16_char_jaccard_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # spread_scan: 5-char shingling is CPU-bound per row — parallelize
    # the sub-core-count single-file scan; no-op at scale
    t = (
        spread_scan(d, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.array_distinct(
                F.transform(
                    char_shingles(F.col("text"), 5), lambda g: F.xxhash64(g)
                )
            ).alias("grams"),
        )
        # recomputable persist for the two-sided reuse — same
        # fault-tolerance rationale as d03 above (VERDICT r8)
        .persist(StorageLevel.DISK_ONLY)
    )
    bucket = (F.col("n_chars") / 5).cast("long")
    a = t.withColumn(
        "probe_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    ).select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("nc_a"),
        F.col("grams").alias("ga"),
        "probe_bucket",
    )
    b = t.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("nc_b"),
        F.col("grams").alias("gb"),
        bucket.alias("bucket_b"),
    )
    jac = exact_jaccard(F.col("ga"), F.col("gb"))
    return (
        a.join(
            b,
            (F.col("probe_bucket") == F.col("bucket_b"))
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("nc_b") >= F.col("nc_a") - 2)
            & (F.col("nc_b") <= F.col("nc_a") + 2),
        )
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )
