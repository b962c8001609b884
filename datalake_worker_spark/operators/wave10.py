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


def bpe_train(words, n: int = N_BPE):
    """Train ``n`` BPE merges on a weighted vocabulary (word, w).

    Returns (merge table [(x, y, weighted_count)...], final symbol
    frame (word, w, pos, sym)). Each round: distributed pair count →
    1-row argmax to the driver → relational run-parity merge-apply.
    The argmax re-enters the plan as a LITERAL (the a16/a17 model-as-
    literal discipline); the symbol frame is localCheckpointed per
    round (iterative lineage truncation, the textrank/graph class —
    vocab-sized, recompute-free).
    """
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
