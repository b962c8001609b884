"""Round-10 operators: the set-operation member of the sketch family
(VERDICT r9 item 5) and real subword tokenization (item 6).

- a18 KMV (k-minimum-values / bottom-k) distinct sketch — the sketch
  family's missing DISTINCT SET ALGEBRA: a11's HLL merges unions only,
  while a KMV summary (the k smallest hash values of a set, Bar-Yossef
  et al. RANDOM'02; Beyer et al. SIGMOD'07) additionally estimates
  intersections and differences between sources via the Jaccard ratio
  observed inside the merged k-min set. Like a17 (DDSketch) and unlike
  HLL's register logic, the summary is FULLY deterministic given the
  hash function — so with a cross-engine hash (sha256 of the canonical
  string, identical in Spark and DuckDB) the whole estimator is
  ORACLE-BACKED hash-green, while the APPROX check pins estimate
  accuracy against exact distinct counts.

Estimator (per source s, k-min set K_s of the distinct-hash set):
  - |K_s| < k  -> the sketch saw every distinct value: estimate EXACT.
  - |K_s| = k  -> est(s) = (k-1)/u_k, u_k = k-th smallest hash mapped
    to (0,1] via its first 52 bits (52 so the integer is exact in a
    double — no cross-engine rounding surface at all).
  - union(a,b): L = k smallest of K_a ∪ K_b (provably the k-min set of
    the union of the underlying sets), same formula on L.
  - intersect(a,b) = ρ·est_union, ρ = |{h ∈ L: h ∈ K_a ∧ h ∈ K_b}|/|L|
    (the Jaccard estimator restricted to the union's k-min sample).
  - except_a(a,b) = max(0, est_a − intersect).

100 TB shape: the ONLY data-scale work is one distinct over
(source, hash) and a two-phase bounded top-k (k smallest per
(source, hash-bucket) in parallel, then k of the ≤ buckets·k
survivors) — every later frame is model-state-sized (≤ sources·k
rows), so the pair algebra runs in broadcast joins by construction.
The reference has no sketch surface at all (696-line chunk store,
src/lib.rs); this extends SURVEY §2.2's "beyond-reference" aggregate
family.

- t30 BPE subword tokenization — replaces t13's regex PROXY with the
  real algorithm (Sennrich, Haddow & Birch, ACL'16): N merge rounds,
  each = a distributed adjacent-pair count over the weighted distinct
  vocabulary, a deterministic argmax (count desc, pair asc), and a
  relational greedy merge-apply. The classic sequential-scan merge
  ("merge left-to-right, skip the symbol you just consumed") becomes a
  pure window computation: a position merges iff it matches the best
  pair AND its offset inside its consecutive run of matches is even —
  exactly the greedy outcome, because overlapping matches only occur
  in x==x runs. Training is iterative like textrank/q24: per round the
  driver receives ONE pair row (the argmax — model state), which
  re-enters the next round's plan as a literal; the vocabulary table
  is localCheckpoint-truncated per round (the blessed iterative
  lineage class). The DuckDB oracle replays the IDENTICAL N rounds as
  unrolled MATERIALIZED CTEs — same counts, same tie-break, same
  run-parity merge — so the learned merge table and every downstream
  token count agree exactly: ORACLE-BACKED hash-green, no floats
  anywhere (pure integer counts + string concat).

  100 TB shape: all state is VOCABULARY-sized (distinct words ×
  avg word length symbol rows), never corpus-sized — the corpus is
  read once into (lang, word) counts; every window partitions by
  `word` (high cardinality, parallel); per-round driver traffic is
  one row. Spark collapses each round's same-spec windows into one
  sort, so a round costs one (word)-hash exchange + one vocabulary
  groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

#: counters per source — the sketch's entire state. 128 binds already
#: at sf0.01 (150 distinct users per event type), so the driver's
#: correctness run exercises the ESTIMATING branch, not just the
#: exact-small-set branch.
KMV_K = 128

#: phase-1 buckets for the distributed bottom-k: each (source, bucket)
#: keeps its own k smallest in parallel, phase 2 reduces the
#: buckets*k survivors. More buckets = more phase-1 parallelism at
#: 100 TB; phase-2 input stays sources*buckets*k rows (model state).
_KMV_BUCKETS = 32

#: 2^52 — hashes map to (0,1] through their first 52 bits, exactly
#: representable in a double in BOTH engines (no rounding surface).
_TWO52 = float(1 << 52)


def _kmv_val(h):
    """First 52 bits of a sha256 hex digest as a double in (0, 1]."""
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint").cast("double")
        / F.lit(_TWO52)
    )


def kmv_kmin(df, source_col: str, key_col: str, k: int = KMV_K):
    """(src, h, rn) — the k lexicographically-smallest sha256 digests
    of ``key_col``'s distinct values per source. Full 64-hex-char
    ordering, so truncated-bit ties cannot reorder engines."""
    hashed = df.select(
        F.col(source_col).alias("src"),
        F.sha2(F.col(key_col).cast("string"), 256).alias("h"),
    ).distinct()
    # phase 1: k smallest per (src, bucket) — parallel over buckets
    b = hashed.withColumn(
        "bkt", F.pmod(F.xxhash64("h"), F.lit(_KMV_BUCKETS))
    )
    w1 = W.partitionBy("src", "bkt").orderBy("h")
    stage = (
        b.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .drop("rn1", "bkt")
    )
    # phase 2: k smallest of the <= buckets*k survivors per source
    w2 = W.partitionBy("src").orderBy("h")
    return (
        stage.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )


def kmv_set_estimates(kmin, k: int = KMV_K):
    """Pairwise distinct-set-operation estimates from per-source k-min
    summaries (model-state-sized input: <= sources*k rows)."""
    kf = F.lit(float(k))
    # per-source estimate: exact when the cap never bound
    per_src = kmin.groupBy("src").agg(
        F.count("*").alias("m"),
        F.max(_kmv_val(F.col("h"))).alias("u"),
    ).select(
        "src",
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise((kf - F.lit(1.0)) / F.col("u"))
        .alias("est"),
    )
    srcs = kmin.select("src").distinct()
    pairs = (
        srcs.select(F.col("src").alias("src_a"))
        .join(srcs.select(F.col("src").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    tag = kmin.select(F.col("src").alias("s"), "h")
    pair_h = (
        pairs.join(
            tag,
            (F.col("s") == F.col("src_a")) | (F.col("s") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "h")
        .agg(
            F.max(F.when(F.col("s") == F.col("src_a"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("s") == F.col("src_b"), 1).otherwise(0)).alias("in_b"),
        )
    )
    wl = W.partitionBy("src_a", "src_b").orderBy("h")
    L = pair_h.withColumn("rn", F.row_number().over(wl)).filter(
        F.col("rn") <= k
    )
    pair_agg = L.groupBy("src_a", "src_b").agg(
        F.count("*").alias("m_u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.max(_kmv_val(F.col("h"))).alias("u_l"),
    )
    est = pair_agg.select(
        "src_a",
        "src_b",
        F.when(F.col("m_u") < k, F.col("m_u").cast("double"))
        .otherwise((kf - F.lit(1.0)) / F.col("u_l"))
        .alias("est_union"),
        (
            F.col("n_both").cast("double") / F.col("m_u").cast("double")
        ).alias("rho"),
    )
    ea = per_src.select(F.col("src").alias("src_a"), F.col("est").alias("est_a"))
    eb = per_src.select(F.col("src").alias("src_b"), F.col("est").alias("est_b"))
    return (
        est.join(ea, "src_a")
        .join(eb, "src_b")
        .select(
            "src_a",
            "src_b",
            "est_a",
            "est_b",
            "est_union",
            (F.col("rho") * F.col("est_union")).alias("est_intersect"),
            F.greatest(
                F.lit(0.0),
                F.col("est_a") - F.col("rho") * F.col("est_union"),
            ).alias("est_except_a"),
        )
    )


#: DuckDB replays the identical estimator. The bucketed phase-1 is a
#: Spark parallelism device only — ANY partitioning yields the same
#: global k-min set — so the oracle ranks directly per source.
_KMV_SQL_VAL = (
    "CAST(CAST('0x' || substr({h}, 1, 13) AS BIGINT) AS DOUBLE) / {two52!r}"
)

_A18_SQL = f"""
    WITH hashed AS (
        SELECT DISTINCT event_type AS src,
               sha256(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    kmin AS (
        SELECT src, h,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY h) AS rn
        FROM hashed
        QUALIFY rn <= {KMV_K}
    ),
    per_src AS (
        SELECT src,
               CASE WHEN COUNT(*) < {KMV_K}
                    THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE ({KMV_K} - 1.0) / MAX({_KMV_SQL_VAL.format(h='h', two52=_TWO52)})
               END AS est
        FROM kmin GROUP BY src
    ),
    pairs AS (
        SELECT a.src AS src_a, b.src AS src_b
        FROM per_src a JOIN per_src b ON a.src < b.src
    ),
    pair_h AS (
        SELECT p.src_a, p.src_b, k.h,
               MAX(CASE WHEN k.src = p.src_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN k.src = p.src_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p
        JOIN kmin k ON k.src IN (p.src_a, p.src_b)
        GROUP BY p.src_a, p.src_b, k.h
    ),
    L AS (
        SELECT src_a, src_b, h, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
        FROM pair_h
        QUALIFY rn <= {KMV_K}
    ),
    pair_agg AS (
        SELECT src_a, src_b,
               COUNT(*) AS m_u,
               SUM(in_a * in_b) AS n_both,
               MAX({_KMV_SQL_VAL.format(h='h', two52=_TWO52)}) AS u_l
        FROM L GROUP BY src_a, src_b
    ),
    est AS (
        SELECT src_a, src_b,
               CASE WHEN m_u < {KMV_K}
                    THEN CAST(m_u AS DOUBLE)
                    ELSE ({KMV_K} - 1.0) / u_l
               END AS est_union,
               CAST(n_both AS DOUBLE) / CAST(m_u AS DOUBLE) AS rho
        FROM pair_agg
    )
    SELECT e.src_a, e.src_b,
           a.est AS est_a, b.est AS est_b,
           e.est_union,
           e.rho * e.est_union AS est_intersect,
           GREATEST(0.0, a.est - e.rho * e.est_union) AS est_except_a
    FROM est e
    JOIN per_src a ON a.src = e.src_a
    JOIN per_src b ON b.src = e.src_b
"""


@register(
    "a18_kmv_distinct_sketch",
    _A18_SQL,
    category="aggregation",
    doc=(
        "KMV / bottom-k distinct sketch (Bar-Yossef et al. RANDOM'02; "
        "Beyer et al. SIGMOD'07) — the distinct SET-ALGEBRA member of "
        "the sketch family: a11's HLL merges unions only, the k-min "
        "summary also estimates pairwise intersection and difference "
        "of the per-event-type distinct-user sets via the Jaccard "
        "ratio inside the merged k-min set (inclusion-exclusion on "
        "summaries, never on data). Deterministic given the hash, and "
        "the hash is cross-engine (sha256 of the canonical string, "
        "first 52 bits as an exact double) => ORACLE-BACKED hash-green "
        "like a17, with the APPROX differential pinning accuracy vs "
        "exact distinct counts. k=128 binds at sf0.01, so the driver "
        "verifies the estimating branch. At 100 TB: one distinct "
        "shuffle + a bucketed two-phase bottom-k; all pair algebra "
        "runs on <= sources*k summary rows (broadcast-sized by "
        "construction)."
    ),
)
def a18_kmv_distinct_sketch(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    kmin = kmv_kmin(e, "event_type", "user_id")
    return kmv_set_estimates(kmin)


# --------------------------------------------------------------- t30 BPE

#: merge rounds. Enough that multi-char tokens win per-language top
#: slots at every SF; each extra round is one more bounded Spark job
#: and one more unrolled oracle CTE block.
N_BPE = 10


def bpe_word_occurrences(df):
    """(lang, word) occurrence rows: lowercase, [a-z]+ words only (the
    deterministic cross-engine word contract; non-Latin text is t03's
    domain). One corpus-scale pass — everything after is vocab-sized."""
    return df.select(
        "lang",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
                " ",
            )
        ).alias("word"),
    ).filter(F.length("word") > 0)


def bpe_train(
    words,
    n: int = N_BPE,
    min_freq: int | None = None,
    max_vocab: int | None = None,
):
    """Train ``n`` BPE merges on a weighted vocabulary (word, w).

    Returns (merge table [(x, y, weighted_count)...], final symbol
    frame (word, w, pos, sym)). Each round: distributed pair count →
    1-row argmax to the driver → relational run-parity merge-apply.
    The argmax re-enters the plan as a LITERAL (the a16/a17 model-as-
    literal discipline); the symbol frame is localCheckpointed per
    round (iterative lineage truncation, the textrank/graph class —
    vocab-sized, recompute-free).

    The 100 TB training bounds (r10 verdict item 6 — the ANN
    ``train_sample_size`` precedent, `similarity.py:_collect_train_sample`):

    - ``min_freq``: drop vocabulary rows with weight < min_freq before
      training (Sennrich et al.'s standard rare-word floor). Merges are
      BIT-IDENTICAL to full training whenever the dropped tail's total
      weight is smaller than every round's argmax margin — on Zipfian
      text the hapax tail is most of the VOCAB but a sliver of the
      MASS, so a small floor bounds training state by orders of
      magnitude without moving a single merge (pinned by pytest on a
      constructed heavy/tail vocab).
    - ``max_vocab``: train on the top-N words by (weight desc, word) —
      a TakeOrdered, ONE distributed job, model-sized thereafter.

    Both bound only the TRAINING input; applying the learned merge
    table to the full corpus is the same merge-apply plan on the
    unfiltered frame.
    """
    if min_freq is not None:
        words = words.filter(F.col("w") >= min_freq)
    if max_vocab is not None:
        words = words.orderBy(
            F.col("w").desc(), F.col("word").asc()
        ).limit(max_vocab)
    wp = W.partitionBy("word").orderBy("pos")
    wrun = wp.rowsBetween(W.unboundedPreceding, 0)
    syms = words.select(
        "word",
        "w",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            )
        ).alias("pos", "sym"),
    )
    # lazy truncation: each round's checkpoint materializes inside the
    # NEXT round's argmax job instead of paying a separate eager pass —
    # halves the per-round job count (N jobs instead of 2N). The frames
    # are vocabulary-sized; production sizes training parallelism to the
    # vocab via spark.sql.shuffle.partitions like any other stage.
    cur = syms.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n):
        m = cur.withColumn("nxt", F.lead("sym").over(wp))
        best = (
            m.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("w").alias("c"))
            .orderBy(F.col("c").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, c = best[0].sym, best[0].nxt, int(best[0].c)
        merges.append((x, y, c))
        is_m = F.coalesce(
            (F.col("sym") == F.lit(x)) & (F.col("nxt") == F.lit(y)), F.lit(False)
        )
        t = (
            m.withColumn("is_m", is_m)
            .withColumn(
                "run_start",
                F.col("is_m") & ~F.coalesce(F.lag("is_m").over(wp), F.lit(False)),
            )
            .withColumn(
                "run_pos",
                F.max(F.when(F.col("run_start"), F.col("pos"))).over(wrun),
            )
            .withColumn(
                "do_m",
                F.when(
                    F.col("is_m")
                    & (((F.col("pos") - F.col("run_pos")) % 2) == 0),
                    F.lit(True),
                ).otherwise(F.lit(False)),
            )
            .withColumn(
                "dropped", F.coalesce(F.lag("do_m").over(wp), F.lit(False))
            )
            .filter(~F.col("dropped"))
        )
        cur = t.select(
            "word",
            "w",
            (F.row_number().over(wp) - 1).alias("pos"),
            F.when(F.col("do_m"), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        ).localCheckpoint(eager=False)
    return merges, cur


def _bpe_iter_ctes(i: int) -> str:
    """One unrolled training round for the DuckDB oracle — the same
    pair count, argmax tie-break and run-parity merge as bpe_train.
    MATERIALIZED is load-bearing: m{i} is referenced twice, and with
    inlining the expression tree doubles per round (2^N blow-up —
    measured as a hang at N=10 without it)."""
    return f""",
    m{i} AS MATERIALIZED (
        SELECT word, w, pos, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM w{i}
    ),
    b{i} AS MATERIALIZED (
        SELECT sym AS x, nxt AS y
        FROM m{i} WHERE nxt IS NOT NULL
        GROUP BY sym, nxt
        ORDER BY CAST(SUM(w) AS BIGINT) DESC, x ASC, y ASC LIMIT 1
    ),
    s{i} AS MATERIALIZED (
        SELECT word, w, pos, sym, nxt,
               CASE WHEN is_m AND (pos - run_pos) % 2 = 0
                    THEN TRUE ELSE FALSE END AS do_m
        FROM (
            SELECT *, MAX(CASE WHEN run_start THEN pos END) OVER
                   (PARTITION BY word ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_pos
            FROM (
                SELECT m.word, m.w, m.pos, m.sym, m.nxt,
                       COALESCE(m.sym = b.x AND m.nxt = b.y, FALSE) AS is_m,
                       COALESCE(m.sym = b.x AND m.nxt = b.y, FALSE)
                       AND NOT COALESCE(
                           LAG(COALESCE(m.sym = b.x AND m.nxt = b.y, FALSE))
                           OVER (PARTITION BY m.word ORDER BY m.pos),
                           FALSE) AS run_start
                FROM m{i} m LEFT JOIN b{i} b ON TRUE
            )
        )
    ),
    w{i + 1} AS MATERIALIZED (
        SELECT word, w,
               ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
               CASE WHEN do_m THEN sym || nxt ELSE sym END AS sym
        FROM (
            SELECT *, COALESCE(LAG(do_m) OVER (PARTITION BY word ORDER BY pos),
                               FALSE) AS dropped
            FROM s{i}
        ) WHERE NOT dropped
    )"""


def _bpe_oracle_sql(n: int = N_BPE) -> str:
    head = """
    WITH occ AS MATERIALIZED (
        SELECT lang, word FROM (
            SELECT lang, unnest(string_split(trim(regexp_replace(lower(text),
                   '[^a-z]+', ' ', 'g')), ' ')) AS word
            FROM documents
        ) WHERE length(word) > 0
    ),
    words AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS w FROM occ GROUP BY word
    ),
    lang_word AS MATERIALIZED (
        SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM occ GROUP BY lang, word
    ),
    posn AS (SELECT word, w, unnest(range(0, length(word))) AS pos FROM words),
    w0 AS MATERIALIZED (
        SELECT word, w, pos, substring(word, pos + 1, 1) AS sym FROM posn
    )"""
    body = "".join(_bpe_iter_ctes(i) for i in range(n))
    tail = f""",
    per_word AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
                 FROM w{n} GROUP BY word),
    tok_lang AS (
        SELECT lw.lang,
               CAST(SUM(lw.n_occ) AS BIGINT) AS n_words,
               CAST(SUM(lw.n_occ * pw.n_tok) AS BIGINT) AS n_tokens
        FROM lang_word lw JOIN per_word pw USING (word) GROUP BY lw.lang
    ),
    freq AS MATERIALIZED (
        SELECT lw.lang, s.sym, CAST(SUM(lw.n_occ) AS BIGINT) AS n
        FROM w{n} s JOIN lang_word lw USING (word) GROUP BY lw.lang, s.sym
    ),
    top AS (
        SELECT lang, sym AS top_token, n AS top_token_n,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, sym ASC) AS rn
        FROM freq QUALIFY rn = 1
    ),
    topm AS (
        SELECT lang, sym AS top_merged, n AS top_merged_n,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, sym ASC) AS rn
        FROM freq WHERE length(sym) >= 2 QUALIFY rn = 1
    )
    SELECT t.lang, t.n_words, t.n_tokens,
           p.top_token, p.top_token_n, q.top_merged, q.top_merged_n
    FROM tok_lang t JOIN top p USING (lang) JOIN topm q USING (lang)"""
    return head + body + tail


@register(
    "t30_bpe_subword_tokens",
    _bpe_oracle_sql(),
    category="text",
    doc=(
        "REAL BPE subword tokenization (Sennrich et al. ACL'16), "
        "replacing t13's regex proxy for the token-budget ops: "
        f"{N_BPE} merge rounds trained relationally on the weighted "
        "distinct vocabulary — per round one distributed adjacent-"
        "pair count, a deterministic argmax (count desc, pair asc) "
        "returned to the driver as ONE row that re-enters the next "
        "plan as a literal, and a window-based greedy merge-apply "
        "(merge iff the match's offset within its consecutive run is "
        "even — provably the sequential greedy outcome). Output: "
        "per-language word/token counts plus the top token and top "
        "MERGED token (the content-sensitive witness that the whole "
        "learned merge table matched). Oracle: DuckDB replays the "
        "identical rounds as unrolled MATERIALIZED CTEs — pure "
        "integer counts, hash-green. Training state is vocabulary-"
        "sized; the corpus is scanned once."
    ),
)
def t30_bpe_subword_tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    occ = bpe_word_occurrences(d)
    words = occ.groupBy("word").agg(F.count("*").alias("w"))
    _, final = bpe_train(words, N_BPE)
    lang_word = occ.groupBy("lang", "word").agg(F.count("*").alias("n_occ"))
    per_word = final.groupBy("word").agg(F.count("*").alias("n_tok"))
    tok_lang = (
        lang_word.join(per_word, "word")
        .groupBy("lang")
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_tok")).cast("long").alias("n_tokens"),
        )
    )
    freq = (
        final.join(lang_word, "word")
        .groupBy("lang", "sym")
        .agg(F.sum("n_occ").cast("long").alias("n"))
    )
    wl = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("sym").asc())
    top = (
        freq.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("sym").alias("top_token"),
            F.col("n").alias("top_token_n"),
        )
    )
    topm = (
        freq.filter(F.length("sym") >= 2)
        .withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("sym").alias("top_merged"),
            F.col("n").alias("top_merged_n"),
        )
    )
    return tok_lang.join(top, "lang").join(topm, "lang")


# ---------------------------------------------------------------------------
# t31: trained quality classifier — relational batch gradient descent
# ---------------------------------------------------------------------------

#: gradient-descent rounds. Each round is ONE corpus aggregation whose
#: map-side partial sums ARE the gradient merge; the driver receives a
#: single 4-value row per round (model state, the t30/a16 literal
#: discipline).
T_LOGREG = 5

#: learning rate — an exact power of two, so the driver-side weight
#: update w - LR*g is EXACT IEEE arithmetic (no rounding surface): the
#: oracle replays the identical update in SQL doubles and lands on the
#: bit-identical weight.
LR_LOGREG = 0.25


def _logreg_features(df):
    """Per-doc features + label, every float rounded to 6 dp at birth
    (the a17 cross-engine recipe). Scales are fixed constants chosen so
    mean(x_j^2) <= ~1: the logloss Hessian bound L = max_j E[x_j^2]/4
    stays ~0.5, hence LR=0.25 < 1/L gives monotone descent — pinned by
    the pytest loss test, not hoped for."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != F.lit("")
    )
    base = (
        df.select(
            "doc_id",
            "n_chars",
            F.size(toks).alias("n_tok"),
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            .alias("n_letters"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[.,!?;:]", ""))
            ).alias("n_punct"),
        )
        .filter(F.col("n_tok") > 0)
    )
    return base.select(
        "doc_id",
        F.round(F.log(F.lit(1.0) + F.col("n_tok")) / 6, 6).alias("x1"),
        F.round(F.col("n_letters").cast("double") / F.col("n_tok") / 10, 6)
        .alias("x2"),
        F.round(F.col("n_punct").cast("double") / F.col("n_chars"), 6)
        .alias("x3"),
        F.when(F.col("n_chars") >= 300, F.lit(1.0)).otherwise(F.lit(0.0))
        .alias("y"),
    )


def _logreg_p(w):
    """sigmoid(round(w·x, 6)) rounded to 6 dp — round INPUT and OUTPUT
    of the libm exp so both engines evaluate exp on the identical
    double and agree after the cut (the a17 LN recipe)."""
    b, c1, c2, c3 = w
    z = F.round(
        F.lit(b)
        + F.lit(c1) * F.col("x1")
        + F.lit(c2) * F.col("x2")
        + F.lit(c3) * F.col("x3"),
        6,
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logreg_train(feat, t: int = T_LOGREG, lr: float = LR_LOGREG):
    """Train logistic-regression weights by full-batch GD, relationally.

    Per round: p = sigmoid(w·x) per row, gradient g_j =
    round(mean((p-y)*x_j), 6) via per-row 9-dp DECIMAL(28,9) contributions
    summed exactly (order-independent — the repo's standard float-agg
    determinism device), then w_j -= lr*g_j driver-side (exact IEEE,
    lr a power of two). Driver traffic: ONE 4-value row per round."""
    w = (0.0, 0.0, 0.0, 0.0)
    xs = (F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3"))
    for _ in range(t):
        r = (_logreg_p(w) - F.col("y")).alias("r")
        agg = feat.select(r, "x1", "x2", "x3").agg(
            *[
                F.sum(
                    F.round(F.col("r") * x, 9).cast("decimal(28,9)")
                ).alias(f"s{j}")
                for j, x in enumerate(xs)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        g = agg.select(
            *[
                F.round(F.col(f"s{j}").cast("double") / F.col("n"), 6).alias(
                    f"g{j}"
                )
                for j in range(4)
            ]
        ).collect()[0]
        w = tuple(w[j] - lr * g[f"g{j}"] for j in range(4))
    return w


def _logreg_iter_ctes(i: int) -> str:
    """One unrolled GD round for the DuckDB oracle — identical scoring,
    9-dp DECIMAL gradient sums and power-of-two weight update."""
    sig = (
        "ROUND(CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE) + exp(-ROUND("
        f"w.b + w.c1*f.x1 + w.c2*f.x2 + w.c3*f.x3, 6))), 6)"
    )
    gsum = (
        "ROUND(CAST(SUM(CAST(ROUND((p - y){mul}, 9) AS DECIMAL(28,9))) "
        "AS DOUBLE)/(SELECT n FROM nn), 6)"
    )
    return f""",
    p{i} AS MATERIALIZED (
        SELECT f.doc_id, f.x1, f.x2, f.x3, f.y, {sig} AS p
        FROM feat f, w{i} w
    ),
    g{i} AS (
        SELECT {gsum.format(mul="")} AS g0,
               {gsum.format(mul="*x1")} AS g1,
               {gsum.format(mul="*x2")} AS g2,
               {gsum.format(mul="*x3")} AS g3
        FROM p{i}
    ),
    w{i + 1} AS (
        SELECT w.b - CAST(0.25 AS DOUBLE)*g.g0 AS b,
               w.c1 - CAST(0.25 AS DOUBLE)*g.g1 AS c1,
               w.c2 - CAST(0.25 AS DOUBLE)*g.g2 AS c2,
               w.c3 - CAST(0.25 AS DOUBLE)*g.g3 AS c3
        FROM w{i} w, g{i} g
    )"""


def _logreg_oracle_sql(t: int = T_LOGREG) -> str:
    head = """
    WITH feat AS MATERIALIZED (
        SELECT doc_id,
               ROUND(ln(CAST(1 AS DOUBLE) + n_tok)/6, 6) AS x1,
               ROUND(CAST(n_letters AS DOUBLE)/n_tok/10, 6) AS x2,
               ROUND(CAST(n_punct AS DOUBLE)/n_chars, 6) AS x3,
               CASE WHEN n_chars >= 300 THEN CAST(1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS y
        FROM (
            SELECT doc_id, n_chars,
                   len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                       w -> w <> '')) AS n_tok,
                   length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                       AS n_letters,
                   length(text) - length(regexp_replace(text, '[.,!?;:]', '',
                       'g')) AS n_punct
            FROM documents
        ) WHERE n_tok > 0
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat),
    w0 AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS c1,
                  CAST(0 AS DOUBLE) AS c2, CAST(0 AS DOUBLE) AS c3)"""
    body = "".join(_logreg_iter_ctes(i) for i in range(t))
    tail = f"""
    SELECT f.doc_id,
           ROUND(CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE) + exp(-ROUND(
               w.b + w.c1*f.x1 + w.c2*f.x2 + w.c3*f.x3, 6))), 6) AS p_quality,
           CAST(CASE WHEN ROUND(CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE) +
               exp(-ROUND(w.b + w.c1*f.x1 + w.c2*f.x2 + w.c3*f.x3, 6))), 6)
               >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS predicted,
           CAST(f.y AS BIGINT) AS label
    FROM feat f, w{t} w"""
    return head + body + tail


@register(
    "t31_quality_logreg",
    _logreg_oracle_sql(),
    category="text",
    doc=(
        "TRAINED quality classifier — the repo's first model-TRAINING "
        "operator: full-batch logistic-regression gradient descent "
        "expressed relationally (the LLM-pipeline step after t02/t17's "
        "heuristic scores: fit a model to labels, score every doc). "
        f"{T_LOGREG} rounds; per round ONE corpus aggregation whose "
        "map-side partial DECIMAL(28,9) sums ARE the gradient merge "
        "(order-independent, the a17 discipline), one 4-value row to "
        "the driver, an exact power-of-two weight update re-entering "
        "the next plan as literals. Oracle: DuckDB replays the "
        "identical unrolled rounds — same 6-dp sigmoid cut, same "
        "DECIMAL gradient sums, bit-identical weights — so per-doc "
        "scores hash-match. 100 TB shape: training state is 4 doubles; "
        "the feature frame is computed once and persisted DISK_ONLY "
        "(recomputable, the r9 cache class); each round = one scan + "
        "one 1-row exchange; scoring is a narrow map with no shuffle."
    ),
)
def t31_quality_logreg(spark, sf_dir):
    from pyspark import StorageLevel

    # r13 added a spread_scan before the persist; the r14 clean A/B
    # (VERDICT r13 item 4: two same-window stash flip-flops) showed it
    # SLOWER both times (2.81/5.73 s with vs 1.93/3.57 s without): the
    # one-time parallel feature extraction saves less than the five
    # GD-round reads of the now-32-partition cached frame cost in task
    # scheduling. Reverted on that signal.
    feat = _logreg_features(
        load_table(spark, sf_dir, "documents")
    ).persist(StorageLevel.DISK_ONLY)
    w = logreg_train(feat, T_LOGREG, LR_LOGREG)
    p = _logreg_p(w)
    return feat.select(
        "doc_id",
        p.alias("p_quality"),
        F.when(p >= 0.5, F.lit(1)).otherwise(F.lit(0)).cast("long")
        .alias("predicted"),
        F.col("y").cast("long").alias("label"),
    )


# ---------------------------------------------------------------------------
# v12: exact kNN JOIN — both sides large, grid-blocked (no broadcast)
# ---------------------------------------------------------------------------

#: grid shape: queries split into A row-blocks, corpus into B
#: column-blocks; every (a, b) cell gets |Q|/A queries x |C|/B corpus
#: vectors. Communication = B*|Q| + A*|C| rows through ONE shuffle —
#: the 1-Bucket-Theta replication grid (Okcan & Riedewald, SIGMOD'11).
#: The grid is SIZED FROM THE INPUT COUNTS (r10 verdict item 1):
#: cells = |Q|*|C| / KNN_CELL_PAIRS and A/B ~ sqrt(|Q|/|C|) — the
#: paper's optimal split — so per-cell work is a constant
#: (~sqrt(KNN_CELL_PAIRS) rows per side per cell) at ANY scale and
#: replication grows as sqrt(|Q|*|C|), never |Q|x|C|. v01's broadcast
#: path needs the whole query set on every executor; this path needs
#: no side to fit anywhere.
KNN_K = 3
#: per-cell pair budget: 2^22 pairs x 64 dims x 2 flops ~ 0.5 GFLOP —
#: a sub-second numpy task; each cell then holds ~2k rows per side
#: (~1 MB of vectors) whatever the corpus size.
KNN_CELL_PAIRS = 1 << 22
#: in-cell score-matrix stripe budget (floats) — the similarity.py
#: `_np_assign` budget_floats discipline: even a skewed cell (uneven
#: `vec_id % A` buckets) never materializes more than ~32 MB.
KNN_STRIPE_FLOATS = 4_000_000
#: per-cell candidates kept per query: K plus slack so rounded-cosine
#: ties crossing a cell boundary can never starve the global top-K.
_KNN_CELL_K = KNN_K + 4


def knn_grid(
    n_q: int, n_c: int, cell_pairs: int = KNN_CELL_PAIRS, min_cells: int = 1
) -> tuple[int, int]:
    """1-Bucket-Theta grid sizing (Okcan & Riedewald SIGMOD'11 §4):
    number of cells = ceil(|Q|*|C| / cell_pairs) so per-cell work is a
    constant, split A x B with A/B ~ sqrt(|Q|/|C|) — the split that
    minimizes replication B*|Q| + A*|C| (~ 2*sqrt(cells*|Q|*|C|)).
    Each cell then sees ~sqrt(cell_pairs) rows per side REGARDLESS of
    input size: a 100x scale-up grows the number of cells 10,000x but
    never the per-cell memory. ``min_cells`` keeps small inputs at
    cluster parallelism."""
    import math

    n_q, n_c = max(1, n_q), max(1, n_c)
    cells = max(min_cells, math.ceil(n_q * n_c / cell_pairs))
    a = max(1, min(n_q, round(math.sqrt(cells * n_q / n_c))))
    b = max(1, min(n_c, math.ceil(cells / a)))
    return a, b

_V12_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 10 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv, e.v)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
        FROM q JOIN e ON q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored)
    WHERE rn <= {KNN_K}
"""


def _knn_cell_fn(left, right):
    """One grid cell: |Q|/A queries x |C|/B corpus vectors -> per-query
    top (K + slack) candidates by (half-up-rounded cosine desc,
    neighbor_id asc) — the global ranking's own key, so the union of
    cells provably contains the global top-K. Raw float64 cosines are
    emitted; the single authoritative 6-dp cut happens in Spark
    (decimal-exact F.round), matching the oracle's ROUND."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )
    if len(left) == 0 or len(right) == 0:
        return empty
    qm = np.array(left["v"].tolist(), dtype=np.float64)
    cm = np.array(right["cv"].tolist(), dtype=np.float64)
    qn = np.sqrt((qm * qm).sum(axis=1))
    cn = np.sqrt((cm * cm).sum(axis=1))
    qid = left["query_id"].to_numpy()
    cid = right["vec_id"].to_numpy()
    out = []
    # row-striped matmul (the similarity.py `_np_assign` budget_floats
    # discipline): the score scratch is stripe x |C_cell| floats, never
    # the full |Q_cell| x |C_cell| matrix — a skewed cell slows down
    # instead of OOMing (r10 verdict item 1).
    stripe = max(16, KNN_STRIPE_FLOATS // max(1, len(cm)))
    for s in range(0, len(qm), stripe):
        t = min(s + stripe, len(qm))
        scores = (qm[s:t] @ cm.T) / (qn[s:t, None] * cn[None, :])
        # half-up (away-from-zero) 6-dp rounding: SELECTION order only
        sel_key = np.sign(scores) * np.floor(np.abs(scores) * 1e6 + 0.5) / 1e6
        for i in range(s, t):
            mask = cid != qid[i]
            idx = np.flatnonzero(mask)
            order = np.lexsort((cid[idx], -sel_key[i - s, idx]))[:_KNN_CELL_K]
            keep = idx[order]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qid[i],
                        "neighbor_id": cid[keep],
                        "cosine": scores[i - s, keep],
                    }
                )
            )
    return pd.concat(out, ignore_index=True) if out else empty


@register(
    "v12_exact_knn_join",
    _V12_ORACLE,
    category="llm-similarity",
    doc=(
        "exact cosine kNN JOIN with BOTH sides large — the shape v01 "
        "cannot serve: v01 broadcasts the query set, which dies when "
        "the queries are themselves a corpus (self-join dedup prep, "
        "corpus-vs-corpus linking). Queries (every 10th vector) and "
        "corpus are tiled into an A x B replication grid SIZED FROM "
        "THE INPUT COUNTS (1-Bucket-Theta, Okcan & Riedewald "
        "SIGMOD'11: cells = |Q|*|C|/pair-budget, A/B ~ sqrt(|Q|/|C|)), "
        "so per-cell work is ~sqrt(pair-budget) rows per side at any "
        "scale: one co-partitioned shuffle, each cell a row-striped "
        "Arrow-batched numpy matmul (score scratch capped at "
        "KNN_STRIPE_FLOATS) emitting per-query top-(K+slack) by the "
        "global ranking key, then one window takes the exact global "
        "top-3. Communication B*|Q| + A*|C| rows — sqrt-scaling "
        "replication, never |Q|x|C| pairs and never a broadcast; the "
        "grid is a pure function of the two side counts, so the "
        "result is grid-independent and stays oracle-exact. "
        "ORACLE-BACKED: raw float64 cosines get "
        "their single 6-dp cut in Spark's decimal-exact round, "
        "matching DuckDB's brute-force join bit-for-bit (v01's "
        "recipe)."
    ),
)
def v12_exact_knn_join(spark, sf_dir):
    from ..functions.similarity import to_double_array

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    # ONE metadata-cheap scan yields both side counts (1-row driver
    # state); the grid is derived from them, so it GROWS with the
    # input instead of being a compile-time constant.
    cnt = e.agg(
        F.count(F.lit(1)).alias("nc"),
        F.count(F.when(F.col("vec_id") % 10 == 0, 1)).alias("nq"),
    ).collect()[0]
    knn_a, knn_b = knn_grid(
        int(cnt["nq"]),
        int(cnt["nc"]),
        min_cells=spark.sparkContext.defaultParallelism,
    )
    # Block assignment must be uniform over QUERY ids, not raw vec_ids:
    # query ids are the multiples of 10, so `vec_id % knn_a` occupies
    # only knn_a/gcd(10, knn_a) of the A blocks whenever knn_a shares a
    # factor with 10 — up to 10x query concentration in a subset of
    # cells, defeating the grid's per-cell budget (ADVICE r11).
    # `(vec_id div 10) % knn_a` ranges over consecutive integers.
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        "v",
        (F.expr("vec_id div 10") % knn_a).cast("int").alias("qb"),
    )
    cb_dim = spark.range(knn_b).select(F.col("id").cast("int").alias("cb"))
    qb_dim = spark.range(knn_a).select(F.col("id").cast("int").alias("qb"))
    q_rep = q.crossJoin(F.broadcast(cb_dim))
    c_rep = e.select(
        F.col("vec_id"),
        F.col("v").alias("cv"),
        (F.col("vec_id") % knn_b).cast("int").alias("cb"),
    ).crossJoin(F.broadcast(qb_dim))
    cells = (
        q_rep.groupBy("qb", "cb")
        .cogroup(c_rep.groupBy("qb", "cb"))
        .applyInPandas(
            _knn_cell_fn,
            "query_id long, neighbor_id long, cosine double",
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cells.select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= KNN_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )
