"""Round-8 operator wave: training-data curation depth — first-occurrence
novelty scoring, duplication-aware sampling weights, token-entropy
quality scoring, a Count-Min-sketch heavy-hitter audit (the CMS member
of the sketch family next to a11's HLL and d14's Bloom), fuzzy
benchmark decontamination (per-benchmark-doc containment via a
broadcast gram join), and a max-drawdown window op.

Shared determinism rules (operators/wave7.py lineage): DECIMAL for
order-independent float sums, per-term ROUND(_, 6) -> DECIMAL where
libm is involved (the t10 recipe), BIGINT casts for counts, unique-key
tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.dedup import shingles_from_words
from ..functions.text import whitespace_tokens
from ..registry import register
from ..sources import load_table, spread_scan
from .common import sql_cast_double


@register(
    "w19_max_drawdown",
    """
    WITH r AS (
        SELECT user_id, value,
               MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM events
    )
    SELECT user_id,
           ROUND(MAX(peak - value), 6) AS max_drawdown,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id
    """,
    category="window",
    doc=(
        "maximum drawdown per user: running peak of the value series in "
        "event order, then the largest peak-to-current drop — the "
        "canonical risk statistic and the same running-extreme window "
        "shape as w10/w13. One hash exchange on user_id serves both the "
        "running max and the final aggregate; subtraction of two "
        "in-order doubles is deterministic, so no DECIMAL detour is "
        "needed. Ties on (ts) break on the unique event key."
    ),
)
def w19_max_drawdown(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = e.select(
        "user_id", "value", F.max("value").over(run).alias("peak")
    )
    return r.groupBy("user_id").agg(
        F.round(F.max(F.col("peak") - F.col("value")), 6).alias("max_drawdown"),
        F.count("*").cast("long").alias("n_events"),
    )


@register(
    "t27_ngram_novelty",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id, gram
        FROM w CROSS JOIN LATERAL (
            SELECT CASE WHEN len(words) < 5
                        THEN [array_to_string(words, ' ')]
                        ELSE [array_to_string(words[(i+1):(i+5)], ' ')
                              for i in range(len(words)-4)] END AS grams
        ) t CROSS JOIN LATERAL (SELECT unnest(t.grams) AS gram) u
    ),
    first AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_grams,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM g JOIN first f USING (gram)
    GROUP BY g.doc_id
    """,
    category="llm-text",
    doc=(
        "first-occurrence n-gram novelty: for each document, the "
        "fraction of its distinct 5-gram shingles whose earliest "
        "appearance (min doc_id over the corpus) is this document — the "
        "curation signal that separates fresh content from recombined "
        "boilerplate (low novelty = mostly previously-seen phrasing). "
        "Per-doc distinct grams explode once; ONE groupBy(gram) "
        "computes the global first owner. Gram MULTIPLICITIES are "
        "Zipfian in natural text (xxhash64 uniformizes values, not "
        "frequencies): a boilerplate gram shared by 30% of docs is a "
        "genuinely hot key, and the r8 join-back on gram put that hot "
        "key through a join AQE structurally cannot skew-split (the "
        "min() aggregate sits between the build-side shuffle and the "
        "sort, so partition duplication would corrupt it — probed "
        "live, r9). Restructured join-free: novel_grams(doc) is just "
        "COUNT(*) of the first-owner table grouped by its min-doc "
        "column, and n_grams(doc) comes straight from the exploded "
        "grams — so the ONLY gram-keyed operation is the groupBy, "
        "whose map-side partial min absorbs any hot gram to one row "
        "per task, and both remaining joins/aggs key on doc_id "
        "(unique, skew-free). Planted 30%-boilerplate test pins "
        "results + plan shape. No driver state."
    ),
)
def t27_ngram_novelty(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # grams travel as xxhash64 longs (the d03 recipe): the gram groupBy
    # and join-back shuffle 8-byte keys instead of ~30-byte strings —
    # counts identical to the string-gram oracle up to 2^-64 collisions
    g = (
        spread_scan(d, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_from_words(
                            F.split(F.trim("text"), r"\s+"), 5
                        ),
                        lambda s: F.xxhash64(s),
                    )
                )
            ).alias("gram"),
        )
    )
    # n_grams: straight per-doc count — g is already distinct-per-doc, and
    # spread_scan's doc_id partitioning satisfies this groupBy's
    # distribution, so no second gram-keyed pass exists anywhere below
    n = g.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    # novel_grams: a gram is novel to exactly the doc that owns its global
    # min(doc_id) — so count the first-owner table by that column instead
    # of joining it back on the (Zipfian-hot) gram key
    nov = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("novel_grams"))
    )
    return (
        n.join(nov, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("novel_grams", F.lit(0)).cast("long").alias("novel_grams"),
            F.round(
                F.coalesce("novel_grams", F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "t28_token_entropy",
    rf"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM tok GROUP BY doc_id, tok
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM cnt GROUP BY doc_id
    ),
    terms AS (
        SELECT cnt.doc_id, tot.n, tot.n_types,
               CAST(ROUND(-(c / n) * LN(c / n) / LN(2), 6)
                    AS DECIMAL(18,6)) AS h
        FROM cnt JOIN tot USING (doc_id)
    )
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_tokens,
           MIN(n_types) AS n_types,
           {sql_cast_double('SUM(h)')} AS entropy
    FROM terms GROUP BY doc_id
    """,
    category="llm-text",
    doc=(
        "per-document Shannon token entropy (bits): the "
        "repetitiveness/quality signal complementary to t12's repetition "
        "ratio — spam and template pages score low, natural prose high. "
        "Per-(doc, token) counts come from one map-side-combined "
        "groupBy; each -p*log2(p) term is rounded to 6 dp and summed as "
        "DECIMAL (the t10 recipe) so the libm-valued sum is "
        "order-independent and hash-matches the oracle exactly."
    ),
)
def t28_token_entropy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        spread_scan(d, "doc_id")
        .select("doc_id", F.explode(whitespace_tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    tot = cnt.groupBy("doc_id").agg(
        F.sum(F.col("c").cast("long")).cast("double").alias("n"),
        F.count("*").cast("long").alias("n_types"),
    )
    p = F.col("c") / F.col("n")
    term = F.round(-p * F.log(p) / F.log(F.lit(2.0)), 6).cast("decimal(18,6)")
    return (
        cnt.join(tot, "doc_id")
        .select("doc_id", "n", "n_types", term.alias("h"))
        .groupBy("doc_id")
        .agg(
            F.min("n").cast("long").alias("n_tokens"),
            F.min("n_types").alias("n_types"),
            F.sum("h").cast("double").alias("entropy"),
        )
    )


@register(
    "smp14_dup_aware_weights",
    f"""
    WITH m AS (
        SELECT source,
               CAST(ROUND(1.0 / (COUNT(*) OVER (PARTITION BY text)), 9)
                    AS DECIMAL(18,9)) AS w
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_cast_double('SUM(w)')} AS effective_docs,
           ROUND(COUNT(*) / {sql_cast_double('SUM(w)')}, 6) AS dup_inflation
    FROM m GROUP BY source
    """,
    category="llm-sampling",
    doc=(
        "duplication-aware sampling weights: each document weighs "
        "1/multiplicity of its exact content group, so a page scraped "
        "k times contributes one effective document — the standard "
        "correction before mixture sampling (pairs with smp08). Per "
        "source: raw count, effective count, and the inflation factor. "
        "The oracle groups on raw text; the engine partitions on "
        "sha2(text) instead — identical multiplicities, but the shuffle "
        "key is a fixed-width 64-char hash rather than document bodies, "
        "which is the only version that moves acceptable bytes at "
        "100 TB. Weights round to 9 dp and sum as DECIMAL so the "
        "1/k-valued sum is order-independent."
    ),
)
def smp14_dup_aware_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # Pre-project the hash to a COLUMN before the window: partitioning by
    # the sha2(text) expression directly would hash the digest for the
    # exchange but still carry the full text column as row payload through
    # the shuffle (ADVICE r8) — projecting first prunes text at the scan,
    # so only (source, 64-char grp) moves.
    hashed = d.select("source", F.sha2(F.col("text"), 256).alias("grp"))
    grp = W.partitionBy("grp")
    m = hashed.select(
        "source",
        F.round(F.lit(1.0) / F.count("*").over(grp), 9)
        .cast("decimal(18,9)")
        .alias("w"),
    )
    return m.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("double").alias("effective_docs"),
        F.round(
            F.count("*") / F.sum("w").cast("double"), 6
        ).alias("dup_inflation"),
    )


@register(
    "a16_cms_heavy_hitters",
    None,  # xxhash64-based sketch cells — differential vs exact counts in APPROX_CHECKS
    category="aggregation",
    doc=(
        "Count-Min-sketch heavy-hitter audit — the CMS member of the "
        "sketch family (a11 HLL, d14 Bloom): a depth-4 x width-1024 "
        "counter matrix is built in ONE distributed job (tokens explode "
        "to (row, cell) coords, one groupBy counts every cell), "
        "collected as bounded model state (32 KB), and re-enters "
        "the plan as ONE parsed literal probed map-side — estimates "
        "never shuffle. Output: the top-20 exact-heaviest tokens with "
        "exact count, CMS estimate (min over rows), and overestimate. "
        "CMS guarantees est >= exact always and "
        "P[over > e/width * N] <= (1/e)^depth; the APPROX check pins "
        "zero undercounts and the bound."
    ),
)
def a16_cms_heavy_hitters(spark, sf_dir, depth: int = 4, width: int = 1024):
    d = load_table(spark, sf_dir, "documents")
    tok = (
        spread_scan(d, "doc_id")
        .select(F.explode(whitespace_tokens("text")).alias("tok"))
        # tokenize once for sketch build + probe. Recomputable DISK_ONLY
        # persist, NOT localCheckpoint: the exploded token table is larger
        # than the input corpus, and a checkpoint severs lineage — on a
        # real cluster one lost executor would kill the whole query with
        # no recompute path (VERDICT r8). DISK_ONLY keeps the reuse
        # without competing with shuffle memory.
        .persist(StorageLevel.DISK_ONLY)
    )
    # distributed build: ONE job for all hash rows — each token explodes
    # into its depth (row, cell) coordinates and a single groupBy counts
    # every cell (<= depth*width result rows; was one job per row, and
    # the 4-job build dominated the query at toy scale)
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64(F.col("tok"), F.lit(r)), F.lit(width)).alias(
                        "cell"
                    ),
                )
                for r in range(depth)
            ]
        )
    )
    counts: dict[tuple[int, int], int] = {
        (int(row["r"]), int(row["cell"])): int(row["n"])
        for row in tok.select(coords.alias("rc"))
        .groupBy("rc.r", "rc.cell")
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: <= depth*width rows
    }
    rows = [
        [counts.get((r, i), 0) for i in range(width)] for r in range(depth)
    ]
    body = ",".join(
        "array(" + ",".join(f"{v}L" for v in row) + ")" for row in rows
    )
    cms = F.expr(f"array({body})")
    est = F.array_min(
        F.array(
            *[
                F.element_at(
                    F.element_at(cms, r + 1),
                    (
                        F.pmod(F.xxhash64(F.col("tok"), F.lit(r)), F.lit(width))
                        + 1
                    ).cast("int"),
                )
                for r in range(depth)
            ]
        )
    )
    exact = tok.groupBy("tok").agg(F.count("*").cast("long").alias("exact_n"))
    # top-20 via orderBy+limit (TakeOrderedAndProject — no global sort,
    # no all-vocab single-partition window); the rank window then runs
    # over exactly 20 rows (the t23 recipe)
    top = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(20)
    return (
        top.withColumn("cms_n", est)
        .withColumn("over", (F.col("cms_n") - F.col("exact_n")).cast("long"))
        .withColumn(
            "rn",
            F.row_number()
            .over(W.orderBy(F.desc("exact_n"), F.asc("tok")))
            .cast("long"),
        )
        .select("rn", "tok", "exact_n", "cms_n", "over")
    )


@register(
    "d17_fuzzy_decontamination",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                    ELSE [array_to_string(words[(i+1):(i+3)], ' ')
                          for i in range(len(words)-2)] END AS grams
        FROM w
    ),
    bg AS (SELECT DISTINCT doc_id AS bench_id, unnest(grams) AS gram
           FROM g WHERE doc_id % 25 = 0),
    bsz AS (SELECT bench_id, COUNT(*) AS n_bg FROM bg GROUP BY bench_id),
    cg AS (SELECT DISTINCT doc_id, unnest(grams) AS gram
           FROM g WHERE doc_id % 25 <> 0),
    m AS (
        SELECT cg.doc_id, bg.bench_id, COUNT(*) AS n_match
        FROM cg JOIN bg USING (gram)
        GROUP BY cg.doc_id, bg.bench_id
    )
    SELECT m.doc_id, m.bench_id,
           ROUND(n_match / CAST(n_bg AS DOUBLE), 6) AS containment
    FROM m JOIN bsz USING (bench_id)
    WHERE n_match / CAST(n_bg AS DOUBLE) >= 0.5
    """,
    category="llm-dedup",
    doc=(
        "per-benchmark-document fuzzy decontamination: d09/t19 score a "
        "corpus doc against the POOLED benchmark gram set; this "
        "attributes leakage to the specific eval document — pairs "
        "(corpus doc, benchmark doc) whose 3-gram CONTAINMENT "
        "(|A intersect B| / |B|, B = that benchmark doc's grams) "
        "reaches 0.5, catching embedded/partial copies whose full-text "
        "Jaccard is diluted by surrounding noise. The benchmark side "
        "is fixed-size (eval suites), so its exploded gram table "
        "BROADCASTS and the corpus is scanned exactly once map-side — "
        "exact recall with no LSH recall risk and nothing pairing "
        "quadratically at 100 TB. Grams travel as xxhash64 longs in "
        "the engine (the d03 recipe); counts match the string-gram "
        "oracle up to 2^-64 collisions."
    ),
)
def d17_fuzzy_decontamination(spark, sf_dir, threshold: float = 0.5):
    d = load_table(spark, sf_dir, "documents")
    g = (
        spread_scan(d, "doc_id")
        .withColumn("w", F.split(F.trim("text"), r"\s+"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_from_words(F.col("w"), 3),
                        lambda s: F.xxhash64(s),
                    )
                )
            ).alias("gram"),
        )
    )
    is_bench = F.col("doc_id") % 25 == 0
    bg = g.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "gram"
    ).persist(StorageLevel.DISK_ONLY)  # bench grams: bounded, reused twice;
    # recomputable persist (not lineage-severing checkpoint) per VERDICT r8
    bsz = bg.groupBy("bench_id").agg(F.count("*").alias("n_bg"))
    m = (
        g.filter(~is_bench)
        .join(F.broadcast(bg), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_match"))
    )
    return (
        m.join(F.broadcast(bsz), "bench_id")
        # filter on the UNROUNDED ratio (exact IEEE division of two
        # integers — bit-identical across engines) so a value rounding
        # up to the threshold cannot split the engines
        .filter(F.col("n_match") / F.col("n_bg").cast("double") >= threshold)
        .withColumn(
            "containment",
            F.round(F.col("n_match") / F.col("n_bg").cast("double"), 6),
        )
        .select("doc_id", "bench_id", "containment")
    )


@register(
    "t29_source_divergence",
    r"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    sc AS (SELECT source, tok, COUNT(*) AS c_s FROM tok GROUP BY source, tok),
    gc AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    ns AS (SELECT source, SUM(c_s) AS n_s FROM sc GROUP BY source),
    ng AS (SELECT SUM(c) AS n FROM gc),
    terms AS (
        -- union over the corpus vocab: tokens absent from a source
        -- contribute |0 - c/N| = c*n_s to the integer numerator.
        -- factors widen to DECIMAL BEFORE the multiply: c_s*N overflows
        -- int64 once the corpus holds ~3e9 tokens (review r8)
        SELECT ns.source,
               ABS(CAST(COALESCE(sc.c_s, 0) AS DECIMAL(19,0))
                     * CAST(ng.n AS DECIMAL(19,0))
                   - CAST(gc.c AS DECIMAL(19,0))
                     * CAST(ns.n_s AS DECIMAL(19,0))) AS num,
               ns.n_s, ng.n
        FROM gc CROSS JOIN ns CROSS JOIN ng
        LEFT JOIN sc ON sc.tok = gc.tok AND sc.source = ns.source
    )
    SELECT source,
           CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           ROUND(CAST(CAST(SUM(num) AS VARCHAR) AS DOUBLE)
                 / (2.0 * MIN(n_s) * MIN(n)), 6) AS tv_distance
    FROM terms GROUP BY source
    """,
    category="llm-text",
    doc=(
        "per-source total-variation distance from the corpus token "
        "distribution — the data-mixing diagnostic that says which "
        "source's language deviates most (pairs with smp08's mixture "
        "resampling: divergent sources get their weights reviewed). "
        "TV = 0.5 * sum_tok |p_s - p| computed EXACTLY: each term's "
        "numerator |c_s*N - c*N_s| is integer, summed as DECIMAL(38,0) "
        "(order-independent, no libm anywhere), with ONE double "
        "division at the end — hash-identical across engines by "
        "construction. The vocab x source expansion is a left join on "
        "the token key: distributed, no driver state, and the source "
        "dimension is small so the per-source totals broadcast."
    ),
)
def t29_source_divergence(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = (
        spread_scan(d, "doc_id")
        .select("source", F.explode(whitespace_tokens("text")).alias("tok"))
        # tokenize once, read by three aggregations — same fault-tolerance
        # rationale as a16 above: recomputable DISK_ONLY persist instead of
        # a lineage-severing localCheckpoint of a bigger-than-input frame.
        .persist(StorageLevel.DISK_ONLY)
    )
    sc = tok.groupBy("source", "tok").agg(F.count("*").alias("c_s"))
    gc = tok.groupBy("tok").agg(F.count("*").alias("c"))
    ns = sc.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    ng = gc.agg(F.sum("c").alias("n"))
    terms = (
        gc.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(ng))
        .join(sc, ["tok", "source"], "left")
        .select(
            "source",
            # widen BEFORE multiplying: long*long wraps/throws past ~3e9
            # total tokens; DECIMAL(19,0) x DECIMAL(19,0) products fit
            # the capped 38-digit result exactly
            F.abs(
                F.coalesce(F.col("c_s"), F.lit(0)).cast("decimal(19,0)")
                * F.col("n").cast("decimal(19,0)")
                - F.col("c").cast("decimal(19,0)")
                * F.col("n_s").cast("decimal(19,0)")
            ).alias("num"),
            "n_s",
            "n",
        )
    )
    return terms.groupBy("source").agg(
        F.min("n_s").cast("long").alias("n_tokens"),
        F.round(
            F.sum("num").cast("double")
            / (F.lit(2.0) * F.min("n_s") * F.min("n")),
            6,
        ).alias("tv_distance"),
    )
