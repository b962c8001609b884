"""Round-10 second wave: the three published LLM-pipeline operators the
surface still lacked — Gopher repetition filtering, exact substring-
dedup spans, and fully-relational k-means clustering.

- t32 Gopher-style repetition filter (Rae et al. 2021, "Scaling
  Language Models: ... Gopher", Table A1): per-document repetition
  metrics over word n-grams — the fraction of characters claimed by
  the single most frequent 2-gram / 3-gram, and the character mass in
  duplicated 5-grams — plus the keep/drop decision. The corpus here is
  single-line word streams, so the paper's line-based rules are
  inapplicable and the n-gram family is the operative one. The
  duplicated-5-gram mass counts every occurrence (count x gram chars)
  WITHOUT the paper's sequential overlap de-marking (that is a per-doc
  scan; the relational variant is a documented upper bound, capped at
  1.0), so the drop threshold is calibrated accordingly. All
  numerators are exact integers; the only float op is one final
  divide + 6-dp round — cross-engine deterministic, ORACLE-BACKED.

  "Top n-gram" is the MOST FREQUENT gram (max count; max char mass
  among count ties — a lexicographic struct max in both engines), not
  the max of count*len over all grams, which would let a long
  once-occurring gram outweigh a repeated short one.

  100 TB shape: every shuffle key contains doc_id — (doc_id, n, gram)
  for the occurrence count, doc_id for the roll-up and the final left
  join — so there is no corpus-frequency key anywhere: no Zipfian
  join-back, no hot key possible, map-side partial aggregation on
  both groupBys. All three gram orders are emitted as (n, gram)
  structs concatenated before ONE explode, so the corpus is scanned
  once: one explode + two partial-agg exchanges total.

- d18 exact substring-dedup spans (Lee et al. ACL'22, "Deduplicating
  Training Data Makes Language Models Better"): their suffix-array
  pass marks every substring of length >= L that occurs twice anywhere
  in the corpus. Relationally: explode char L-grams with positions,
  keep positions whose gram is corpus-duplicated, and merge each doc's
  surviving [pos, pos+L-1] intervals into maximal spans (the w18
  sweep-line island device: a new span starts where pos overshoots the
  running max end + 1). Span coverage inside an island is contiguous
  by construction, so covered chars = max(end) - min(start) + 1
  exactly — no double counting, unlike t32's documented estimator.
  Output: per-doc span count, deduped char mass, char fraction.

  100 TB shape: the corpus-frequency table IS Zipfian (hot boilerplate
  grams are the point), so the position->dup-flag join-back goes
  through the audited ``salted_join`` (skew.py; the r9 audit's tool)
  with the dup-gram table key-collapsed to one row per gram; the
  frequency groupBy itself absorbs hot grams map-side. Windows and
  the final roll-up partition by doc_id. L-grams shuffle as 20-char
  strings (not hashes) so the oracle is EXACT — no collision caveat.

- v13 relational k-means (Lloyd's algorithm) — the clustering step
  SemDeDup/IVF currently fit driver-side on a sample (similarity.py:
  ~100k sha-ranked rows) becomes a full-corpus distributed training
  loop, the t30/t31 iterative pattern: per round ONE vec_id-keyed
  aggregation computes all k distances (centroids enter the plan as
  LITERAL arrays — no join), a when-chain argmin assigns, one
  (cluster, dim) aggregation re-estimates means, and k x dim rounded
  values return to the driver as the only model state. Determinism is
  the t31/a17 discipline taken one step FURTHER: 6-dp-rounded inputs
  cast to DECIMAL(12,6) and squared EXACTLY (DECIMAL(26,12) products,
  no intermediate rounding anywhere — ROUND(double, 9) per term is
  not cross-engine safe at this op's ~2M roundings per run), exact
  order-independent sums, DECIMAL(18,6) mean numerators, 6-dp
  centroid round, argmin ties broken by lowest cluster id on EXACT
  decimal distances. The DuckDB oracle replays the identical unrolled rounds
  from the identical sha256-ranked init — bit-identical centroids —
  so per-vector assignments hash-match: ORACLE-BACKED, like t31 and
  unlike every sampled/driver-fit model in the v-family.

  100 TB shape: per round = one scan of the exploded (vec_id, dim, x)
  frame (persisted DISK_ONLY, recomputable — the r9 cache class), one
  vec_id exchange for distances, one vec_id-keyed join + one
  (cluster, dim) partial agg for means; driver traffic k*dim doubles.
  No broadcast of anything data-sized; no all-pairs anywhere.

Reference parity note: the reference (696-LoC Rust chunk store,
src/lib.rs) has no analytics surface; these extend SURVEY §2.2's
beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .skew import salted_join

# ---------------------------------------------------------------------------
# t32: Gopher repetition filter
# ---------------------------------------------------------------------------

#: Gopher Table A1 thresholds for the top-n-gram character fractions.
T32_TOP2_MAX = 0.20
T32_TOP3_MAX = 0.18
#: duplicated-5-gram char-mass bound — calibrated for the overlap-
#: counting relational estimator (the paper's 0.15 assumes de-marked
#: overlaps; every occurrence counted inflates repeated text ~Lx).
T32_DUP5_MAX = 0.60

_T32_ORACLE = rf"""
    WITH d AS (
        SELECT doc_id, n_chars,
               regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, 2 AS n, array_to_string(w[i:i+1], ' ') AS gram
        FROM d, UNNEST(range(1, len(w) - 2 + 2)) AS t(i)
        UNION ALL
        SELECT doc_id, 3 AS n, array_to_string(w[i:i+2], ' ') AS gram
        FROM d, UNNEST(range(1, len(w) - 3 + 2)) AS t(i)
        UNION ALL
        SELECT doc_id, 5 AS n, array_to_string(w[i:i+4], ' ') AS gram
        FROM d, UNNEST(range(1, len(w) - 5 + 2)) AS t(i)
    ),
    c AS (
        -- the packing guard (r10 ADVICE): the m-CTE's c*10^12 + mass
        -- argmax packing assumes per-gram mass < 10^12; a pathological
        -- doc violating it must FAIL the oracle loudly, never corrupt
        -- the reference value
        SELECT doc_id, n, gram, COUNT(*) AS c,
               CASE WHEN COUNT(*) * length(gram) >= 1000000000000
                    THEN CAST(error('t32 oracle: per-gram mass exceeds '
                                    'the 10^12 packing range') AS BIGINT)
                    ELSE COUNT(*) * length(gram) END AS mass
        FROM g GROUP BY doc_id, n, gram
    ),
    m AS (
        -- (max count, then max mass) argmax as ONE integer max:
        -- c*10^12 + mass orders identically to the lexicographic
        -- (c, mass) struct max Spark runs (DuckDB's struct-max
        -- aggregate measured 160x slower at the 10x corpus; valid
        -- while per-doc mass < 10^12 and c < 9.2e6 — documents
        -- orders of magnitude beyond any real doc)
        SELECT doc_id,
               MAX(CASE WHEN n = 2 THEN c * 1000000000000 + mass END)
                   % 1000000000000 AS m2,
               MAX(CASE WHEN n = 3 THEN c * 1000000000000 + mass END)
                   % 1000000000000 AS m3,
               SUM(CASE WHEN n = 5 AND c >= 2 THEN mass ELSE 0 END) AS m5
        FROM c GROUP BY doc_id
    ),
    f AS (
        SELECT d.doc_id,
               ROUND(LEAST(COALESCE(m.m2, 0) / CAST(d.n_chars AS DOUBLE),
                           1.0), 6) AS top2gram_frac,
               ROUND(LEAST(COALESCE(m.m3, 0) / CAST(d.n_chars AS DOUBLE),
                           1.0), 6) AS top3gram_frac,
               ROUND(LEAST(COALESCE(m.m5, 0) / CAST(d.n_chars AS DOUBLE),
                           1.0), 6) AS dup5gram_frac
        FROM d LEFT JOIN m USING (doc_id)
    )
    SELECT doc_id, top2gram_frac, top3gram_frac, dup5gram_frac,
           CAST(CASE WHEN top2gram_frac > {T32_TOP2_MAX}
                     OR top3gram_frac > {T32_TOP3_MAX}
                     OR dup5gram_frac > {T32_DUP5_MAX}
                THEN 0 ELSE 1 END AS BIGINT) AS keep
    FROM f
"""


def _gram_structs(n: int):
    """(n, gram) structs for all word n-grams of the pre-split array
    `w` — one array expression per gram order, concatenated so ALL
    orders come out of ONE explode over ONE scan.

    The sequence is guarded: Spark's sequence(1, stop) DESCENDS when
    stop < 1 (unlike DuckDB's empty range), so short docs must yield
    zero grams explicitly.
    """
    seq = F.when(
        F.size("w") >= n, F.sequence(F.lit(1), F.size("w") - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        seq,
        lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice("w", i, n)).alias("gram"),
        ),
    )


@register(
    "t32_repetition_filter",
    _T32_ORACLE,
    category="llm-text",
    doc=(
        "Gopher-style repetition filter (Rae et al. 2021 Table A1): "
        "per-doc top-2-gram / top-3-gram char fraction and duplicated-"
        "5-gram char mass (documented overlap-counting upper bound, "
        "capped at 1), plus the keep decision. Exact integer "
        "numerators, one 6-dp divide. Every shuffle key contains "
        "doc_id — no corpus-frequency key, no Zipfian join-back "
        "possible; two partial-agg exchanges + one doc_id join."
    ),
)
def t32_repetition_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "n_chars", F.split(F.trim("text"), r"\s+").alias("w")
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.concat(_gram_structs(2), _gram_structs(3), _gram_structs(5))
        ).alias("g"),
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    c = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c"),
        (F.count(F.lit(1)) * F.length("gram")).alias("mass"),
    )
    # the TOP gram is the MOST FREQUENT one (max count, max mass among
    # count ties) — a lexicographic struct max, NOT max(mass), which
    # would let a long once-occurring gram outweigh a repeated short
    # one and mis-drop repetition-free docs
    top = F.struct(F.col("c"), F.col("mass"))
    m = c.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, top)).getField("mass").alias("m2"),
        F.max(F.when(F.col("n") == 3, top)).getField("mass").alias("m3"),
        F.sum(
            F.when((F.col("n") == 5) & (F.col("c") >= 2), F.col("mass"))
            .otherwise(F.lit(0))
        ).alias("m5"),
    )
    nc = F.col("n_chars").cast("double")
    fracs = {
        name: F.round(
            F.least(F.coalesce(F.col(src), F.lit(0)) / nc, F.lit(1.0)), 6
        )
        for name, src in (
            ("top2gram_frac", "m2"),
            ("top3gram_frac", "m3"),
            ("dup5gram_frac", "m5"),
        )
    }
    drop = (
        (fracs["top2gram_frac"] > T32_TOP2_MAX)
        | (fracs["top3gram_frac"] > T32_TOP3_MAX)
        | (fracs["dup5gram_frac"] > T32_DUP5_MAX)
    )
    return (
        d.select("doc_id", "n_chars")
        .join(m, "doc_id", "left")
        .select(
            "doc_id",
            fracs["top2gram_frac"].alias("top2gram_frac"),
            fracs["top3gram_frac"].alias("top3gram_frac"),
            fracs["dup5gram_frac"].alias("dup5gram_frac"),
            F.when(drop, F.lit(0)).otherwise(F.lit(1)).cast("long")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# d18: exact substring-dedup spans
# ---------------------------------------------------------------------------

#: marked-substring length (Lee et al. use 50 BPE tokens on web text;
#: 20 chars is the same ~4-5-word granularity on this corpus's short
#: synthetic docs).
D18_L = 20

_D18_ORACLE = f"""
    WITH d AS (SELECT doc_id, text, n_chars FROM documents),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               substr(text, CAST(i AS INTEGER), {D18_L}) AS gram
        FROM d, UNNEST(range(1, length(text) - {D18_L} + 2)) AS t(i)
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    p AS (
        SELECT g.doc_id, g.pos, g.pos + {D18_L} - 1 AS e
        FROM g JOIN dup USING (gram)
    ),
    isl AS (
        SELECT doc_id, pos, e,
               CASE WHEN MAX(e) OVER w1 IS NULL
                         OR pos > MAX(e) OVER w1 + 1
                    THEN 1 ELSE 0 END AS new_isl
        FROM p
        WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    spans AS (
        SELECT doc_id, isl, MAX(e) - MIN(pos) + 1 AS covered
        FROM (
            SELECT doc_id, pos, e,
                   SUM(new_isl) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS isl
            FROM isl
        ) GROUP BY doc_id, isl
    ),
    agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(covered) AS BIGINT) AS dup_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.dup_chars, 0) AS dup_chars,
           ROUND(COALESCE(a.dup_chars, 0) / CAST(d.n_chars AS DOUBLE),
                 6) AS dup_frac
    FROM d LEFT JOIN agg a USING (doc_id)
"""


@register(
    "d18_substring_dedup_spans",
    _D18_ORACLE,
    category="llm-dedup",
    doc=(
        "exact substring-dedup span marking (Lee et al. ACL'22): every "
        f"char {D18_L}-gram duplicated anywhere in the corpus marks its "
        "[pos, pos+L-1] interval; per-doc intervals merge into maximal "
        "spans via the w18 sweep-line island window, coverage exact "
        "(contiguous within an island by construction). The Zipfian "
        "gram join-back (hot boilerplate grams are the point of the "
        "op) goes through the audited salted_join with a key-collapsed "
        "dup-gram table; the frequency groupBy absorbs hot grams in "
        "map-side partials. Grams shuffle as the raw 20-char strings, "
        "so the DuckDB oracle is exact — no hash-collision caveat."
    ),
)
def d18_substring_dedup_spans(spark, sf_dir):
    # lifetime decision (r10 ADVICE, measured r11): the gram frame's
    # blocks are released by the session janitor, NOT inside the
    # operator. Eagerly localCheckpoint-ing the result to unpersist g
    # here was measured at 9.3 s vs 1.3 s cold (checkpoint
    # materialization forfeits the count-plan pruning AND the
    # identical-plan cache reuse that makes repeat invocations 0.2 s),
    # so the janitor lifetime the advisor called acceptable is also
    # the fast one.
    out, _g = _d18_build(spark, sf_dir)
    return out


def _d18_build(spark, sf_dir):
    """The lazy span-marking plan plus its persisted gram frame —
    split out so plan gates can inspect the pre-checkpoint plan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    # the exploded L-gram frame is consumed twice (corpus-frequency
    # groupBy + salted join-back probe side): persist DISK_ONLY so the
    # dominant explode+substring pass runs once (recomputable — the r9
    # cache class, wave8 a16 precedent)
    g = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.length("text") >= D18_L,
                F.sequence(F.lit(1), F.length("text") - D18_L + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        "text",
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"substring(text, pos, {D18_L})").alias("gram"),
    ).persist(StorageLevel.DISK_ONLY)
    dup = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    p = salted_join(g, dup, "gram", how="inner").select(
        "doc_id", "pos", (F.col("pos") + D18_L - 1).alias("e")
    )
    w1 = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w2 = W.partitionBy("doc_id").orderBy("pos")
    spans = (
        p.withColumn("prev_e", F.max("e").over(w1))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev_e").isNull()
                | (F.col("pos") > F.col("prev_e") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("isl", F.sum("new_isl").over(w2))
        .groupBy("doc_id", "isl")
        .agg((F.max("e") - F.min("pos") + 1).alias("covered"))
    )
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("covered").alias("dup_chars"),
    )
    out = (
        docs.select("doc_id", "n_chars")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_chars", F.lit(0)).cast("long")
            .alias("dup_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0))
                / F.col("n_chars").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )
    return out, g


# ---------------------------------------------------------------------------
# v13: relational k-means (Lloyd's), oracle-backed
# ---------------------------------------------------------------------------

KM_K = 4
KM_ITERS = 3
KM_DIM = 64


def _km_exploded(spark, sf_dir):
    """(vec_id, d, x): 1-based dimension index, 6-dp-rounded double.
    The 6-dp cut is a DECIMAL(12,6) cast, not ROUND(double, 6)
    (r10 ADVICE): Spark's double->decimal cast rounds the shortest
    decimal representation HALF_UP — exactly what the oracle replays
    with CAST(CAST(x AS VARCHAR) AS DECIMAL(12,6)), DuckDB's VARCHAR
    of a double being the same shortest round-trip repr — so the two
    engines can never disagree on a 6-dp boundary."""
    from ..functions.similarity import to_double_array
    from ..sources import spread_scan

    # spread_scan (the d03/t21 pattern): the single-file embeddings scan
    # plans as ONE task, so every exact-DECIMAL distance aggregation
    # over the (persisted) exploded frame ran single-threaded — measured
    # 280-600 ms per k-means stage on local[32] with 31 cores idle.
    # Hash-repartition by vec_id up to the core count before the
    # explode; no-op at scale, bit-identical results (keyed aggs over
    # exact decimals are order-independent).
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select("vec_id", to_double_array("embedding").alias("v"))
    return e.select(
        "vec_id", F.posexplode("v").alias("p", "xr")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.col("xr").cast("decimal(12,6)").cast("double").alias("x"),
    )


def _sha_topk_rows(frame, ids_frame, k: int):
    """Shared sha-ranked init collect (_km_init / _v16_init_books): the
    k vec_ids with the smallest sha256(vec_id) digests, their component
    rows shipped with the digests in ONE job (broadcast the id frame
    back onto ``frame``). Returns (rows, ids) where ids is the
    digest-ranked order-preserving distinct id list (ADVICE r13: linear
    dict.fromkeys, not the O(k^2) seen-list idiom)."""
    top = (
        ids_frame.select("vec_id")
        .distinct()
        .select(
            "vec_id", F.sha2(F.col("vec_id").cast("string"), 256).alias("h")
        )
        .orderBy("h")
        .limit(k)
    )
    rows = frame.join(F.broadcast(top), "vec_id").collect()
    ids = list(
        dict.fromkeys(r.vec_id for r in sorted(rows, key=lambda r: r.h))
    )
    return rows, ids


def _km_init(ex) -> dict[int, list[float]]:
    """Initial centroids: the KM_K vectors with the smallest
    sha256(vec_id) digests, cluster id = digest rank — deterministic
    and sha-scattered (the similarity.py sampling convention), and
    exactly replayable in the oracle's ROW_NUMBER OVER (ORDER BY
    sha256)."""
    rows, ids = _sha_topk_rows(ex, ex, KM_K)
    by_id: dict[int, list[float]] = {i: [0.0] * KM_DIM for i in ids}
    for r in rows:
        by_id[r.vec_id][r.d - 1] = r.x
    return {j: by_id[i] for j, i in enumerate(ids)}


def _km_dist_aggs(cents: dict[int, list[float]]) -> list:
    """The k exact-DECIMAL squared-distance aggregate columns (d0..dk):
    centroids are literal arrays (no join). The arithmetic is PURE
    DECIMAL end-to-end — 6-dp inputs cast to DECIMAL(12,6), exact
    products DECIMAL(26,12), exact order-independent sums — because
    ROUND(double, 9) per term is NOT cross-engine safe: Spark rounds
    the shortest decimal representation (BigDecimal.valueOf), DuckDB
    the full binary expansion, and at ~2M roundings per run a 1e-9
    disagreement is likely (one flipped a sum's 6th decimal at
    sf0.1). Exact products have no rounding step to disagree on."""
    from ..functions.similarity import lit_matrix

    aggs = []
    for j in range(KM_K):
        # lit_matrix: ONE parsed literal per centroid, not dim F.lit
        # Py4J calls (similarity.py:32 — measured plan-build cost)
        carr = lit_matrix(cents[j])
        diff = F.col("x").cast("decimal(12,6)") - F.element_at(
            carr, F.col("d")
        ).cast("decimal(12,6)")
        aggs.append(F.sum(diff * diff).alias(f"d{j}"))
    return aggs


def _km_dists(ex, cents: dict[int, list[float]]):
    """One vec_id-keyed aggregation computing ALL k squared distances
    (see _km_dist_aggs for the exactness argument)."""
    return ex.groupBy("vec_id").agg(*_km_dist_aggs(cents))


def _km_argmin_col(n: int = KM_K, prefix: str = "d"):
    """Argmin over n exact-decimal distance columns; the when-chain
    takes the LOWEST index on ties (the oracle's ORDER BY dist, id)."""
    dcols = [F.col(f"{prefix}{j}") for j in range(n)]
    m = F.least(*dcols)
    cl = F.lit(None)
    for j in reversed(range(n)):
        cl = F.when(dcols[j] == m, F.lit(j)).otherwise(cl)
    return cl, m


def _km_assign(dists):
    """Argmin over the k exact-decimal distance columns; lowest cluster
    id on ties (the oracle's ORDER BY dist, cl)."""
    cl, m = _km_argmin_col()
    return dists.select(
        "vec_id", cl.cast("long").alias("cluster"), m.alias("mdist")
    )


def kmeans_train(ex, iters: int = KM_ITERS) -> dict[int, list[float]]:
    """Lloyd's: per round ONE fused pass over ex (distances + argmin +
    carried (d, x) rows) feeding one (cluster, dim) mean — k*dim
    rounded doubles to the driver. Empty clusters keep their previous
    centroid.

    The 6-dp centroid mean is INTEGER-EXACT (r10 ADVICE): the DECIMAL
    sum is exactly scaled to micro-units (a long), and half-away-from-
    zero rounding of sum/n is computed as sign * ((2|s| + n) div (2n))
    — pure integral arithmetic both engines execute identically (Spark
    `div` and DuckDB `//` both truncate toward zero; operands are kept
    non-negative anyway). The final /1e6 is one IEEE double division of
    identical operands, so the centroid literal is bit-identical to the
    oracle's with NO double-rounding step anywhere."""
    cents = _km_init(ex)
    for _ in range(iters):
        # FUSED assignment+update (r14, guide §2.4): ONE vec_id-keyed
        # aggregation computes the k distances AND carries the vector's
        # (d, x) rows through the argmin as a collected list, so the
        # round makes a single pass over ex instead of a distance pass
        # plus an ex-join-assign pass. Re-exploding the list hands the
        # (cluster, d) mean EXACTLY the multiset of rows the join
        # produced (each vec contributes its 64 (d, x) rows tagged with
        # its argmin cluster); the DECIMAL sums are order-independent,
        # so the update — and every downstream centroid — is
        # bit-identical to the joined form the oracle replays.
        fused = ex.groupBy("vec_id").agg(
            *_km_dist_aggs(cents),
            F.collect_list(F.struct("d", "x")).alias("_pts"),
        )
        cl, _ = _km_argmin_col()
        assigned = fused.select(cl.cast("long").alias("cluster"), "_pts")
        upd = (
            assigned.select("cluster", F.explode("_pts").alias("_p"))
            .select("cluster", F.col("_p.d").alias("d"), F.col("_p.x").alias("x"))
            .groupBy("cluster", "d")
            .agg(
                (F.sum(F.col("x").cast("decimal(18,6)")) * 1000000)
                .cast("long")
                .alias("s6"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cluster",
                "d",
                (
                    F.when(F.col("s6") < 0, -1).otherwise(1)
                    * F.expr("(2 * abs(s6) + n) div (2 * n)")
                    / F.lit(1000000.0)
                ).alias("c"),
            )
            .collect()
        )
        nxt = {j: list(cents[j]) for j in range(KM_K)}
        for r in upd:
            nxt[r.cluster][r.d - 1] = r.c
        cents = nxt
    return cents


def _km_iter_ctes(i: int) -> str:
    """One unrolled Lloyd round for the DuckDB oracle: identical exact
    DECIMAL distance sums, (dist, cl) argmin, DECIMAL mean numerators
    and 6-dp centroid round; empty clusters carry c{i} forward."""
    return f""",
    dist{i} AS MATERIALIZED (
        SELECT e.vec_id, c.cl,
               SUM((CAST(e.x AS DECIMAL(12,6)) - CAST(c.c AS DECIMAL(12,6)))
                   * (CAST(e.x AS DECIMAL(12,6))
                      - CAST(c.c AS DECIMAL(12,6)))) AS dist
        FROM e JOIN c{i} c USING (d) GROUP BY e.vec_id, c.cl
    ),
    a{i} AS MATERIALIZED (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM dist{i}) WHERE rn = 1
    ),
    c{i + 1} AS MATERIALIZED (
        -- integer-exact 6-dp half-away mean (see kmeans_train): the
        -- DECIMAL sum scaled to exact micro-units, then
        -- sign * ((2|s| + n) // (2n)) — DuckDB's // truncates toward
        -- zero like Spark's div; /1e6 is one IEEE double division
        SELECT c.cl, c.d, COALESCE(u.c2, c.c) AS c
        FROM c{i} c LEFT JOIN (
            SELECT cl, d,
                   (CASE WHEN s6 < 0 THEN -1 ELSE 1 END)
                   * ((2 * abs(s6) + n) // (2 * n)) / 1000000.0 AS c2
            FROM (
                SELECT a.cl, e.d,
                       CAST(SUM(CAST(e.x AS DECIMAL(18,6))) * 1000000
                            AS HUGEINT) AS s6,
                       COUNT(*) AS n
                FROM a{i} a JOIN e USING (vec_id) GROUP BY a.cl, e.d
            )
        ) u ON u.cl = c.cl AND u.d = c.d
    )"""


def _km_oracle_head() -> str:
    """The shared oracle prelude (exploded 6-dp frame + sha-ranked
    init + c0) — reused verbatim by v15's IVF audit (wave13)."""
    return f"""
    WITH e AS MATERIALIZED (
        -- 6-dp cut via VARCHAR->DECIMAL: DuckDB's VARCHAR of a double
        -- is the shortest round-trip repr, and the DECIMAL parse
        -- rounds it HALF_UP — the identical rule Spark's
        -- double->decimal(12,6) cast applies (see _km_exploded)
        SELECT vec_id, CAST(t.d + 1 AS INTEGER) AS d,
               CAST(CAST(CAST(CAST(embedding[CAST(t.d + 1 AS INTEGER)]
                    AS DOUBLE) AS VARCHAR) AS DECIMAL(12,6)) AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(0, {KM_DIM})) AS t(d)
    ),
    init AS (
        SELECT vec_id, CAST(ROW_NUMBER() OVER (
            ORDER BY sha256(CAST(vec_id AS VARCHAR))) - 1 AS INTEGER) AS cl
        FROM (SELECT DISTINCT vec_id FROM embeddings)
        QUALIFY cl < {KM_K}
    ),
    c0 AS MATERIALIZED (
        SELECT i.cl, e.d, e.x AS c FROM init i JOIN e USING (vec_id)
    )"""


def _km_oracle_sql(iters: int = KM_ITERS) -> str:
    head = _km_oracle_head()
    body = "".join(_km_iter_ctes(i) for i in range(iters))
    tail = f""",
    distF AS (
        SELECT e.vec_id, c.cl,
               SUM((CAST(e.x AS DECIMAL(12,6)) - CAST(c.c AS DECIMAL(12,6)))
                   * (CAST(e.x AS DECIMAL(12,6))
                      - CAST(c.c AS DECIMAL(12,6)))) AS dist
        FROM e JOIN c{iters} c USING (d) GROUP BY e.vec_id, c.cl
    )
    SELECT vec_id, CAST(cl AS BIGINT) AS cluster,
           CAST(ROUND(dist, 6) AS DOUBLE) AS dist
    FROM (
        SELECT vec_id, cl, dist, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
        FROM distF) WHERE rn = 1"""
    return head + body + tail


@register(
    "v13_kmeans_clusters",
    _km_oracle_sql(),
    category="llm-similarity",
    doc=(
        "fully-relational k-means (Lloyd's) — distributed model "
        f"TRAINING like t31, not a driver-side sample fit: {KM_ITERS} "
        "rounds, each ONE vec_id-keyed aggregation computing all "
        f"{KM_K} squared distances with centroids as literal arrays "
        "(no join), a when-chain argmin (lowest cluster on ties), one "
        "(cluster, dim) DECIMAL mean; k*dim rounded doubles of driver "
        "state per round. Exact DECIMAL(26,12) squared-term products "
        "make every distance exact and order-independent; the DuckDB "
        "oracle replays identical unrolled rounds from the identical "
        "sha256-ranked init — bit-identical centroids, hash-green "
        "assignments. 100 TB: exploded frame persists DISK_ONLY "
        "(recomputable); per round one scan + one vec_id exchange + "
        "one bounded (cluster, dim) partial agg; no broadcast of "
        "anything data-sized."
    ),
)
def v13_kmeans_clusters(spark, sf_dir):
    # DISK_ONLY kept (r14): MEMORY_AND_DISK_DESER was A/B'd for the
    # training window (VERDICT r13 item 1) — interleaved same-window
    # pairs split 1-1 within noise (v16 7.52/6.95 vs 7.45/7.59), so the
    # recomputable-DISK discipline stays; at 100 TB deserialized caching
    # of a corpus-sized exploded frame would also compete with execution
    # memory.
    ex = _km_exploded(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    cents = kmeans_train(ex, KM_ITERS)
    # round the exact DECIMAL, THEN cast: rounding after a double cast
    # loses the half-way cases a 9-dp decimal can park exactly on the
    # 6th decimal (one row at sf0.1 did: ....8425 -> engines disagree
    # on the double's nearest 6-dp neighbour; the decimal rounds
    # identically HALF_UP in both).
    out = _km_assign(_km_dists(ex, cents)).select(
        "vec_id",
        "cluster",
        F.round(F.col("mdist"), 6).cast("double").alias("dist"),
    )
    # janitor lifetime for ex (r10 ADVICE, measured r11): the in-op
    # eager-checkpoint release cost ~0.5 s extra per invocation and
    # forfeits identical-plan reuse — see d18's note.
    return out


# ---------------------------------------------------------------------------
# q25: supplier co-occurrence triangles (degree-oriented triangle count)
# ---------------------------------------------------------------------------

#: edge threshold quantile: pairs whose co-order count reaches the P90
#: of all pair counts form the affinity graph. A RELATIVE threshold
#: self-normalizes graph density across scale factors (an absolute
#: count would go from empty at sf0.001 to near-complete at 10x).
Q25_EDGE_QUANTILE = 0.9

_Q25_ORACLE = f"""
    WITH lo AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    pairs AS MATERIALIZED (
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, COUNT(*) AS c
        FROM lo a JOIN lo b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY s1, s2
    ),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
               COUNT(*) OVER () AS n
        FROM pairs
    ),
    thr AS (
        SELECT c AS t FROM ranked
        WHERE rn = CAST(CEIL({Q25_EDGE_QUANTILE} * n) AS BIGINT)
    ),
    edges AS MATERIALIZED (SELECT s1, s2 FROM pairs, thr WHERE c >= t),
    deg AS MATERIALIZED (
        SELECT s, COUNT(*) AS d FROM (
            SELECT s1 AS s FROM edges UNION ALL SELECT s2 FROM edges
        ) GROUP BY s
    ),
    o AS MATERIALIZED (
        SELECT CASE WHEN (d1.d, e.s1) < (d2.d, e.s2)
                    THEN e.s1 ELSE e.s2 END AS u,
               CASE WHEN (d1.d, e.s1) < (d2.d, e.s2)
                    THEN e.s2 ELSE e.s1 END AS v
        FROM edges e
        JOIN deg d1 ON d1.s = e.s1
        JOIN deg d2 ON d2.s = e.s2
    ),
    tri AS MATERIALIZED (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM o e1
        JOIN o e2 ON e1.v = e2.u
        JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    cnt AS (
        SELECT s, COUNT(*) AS n_triangles FROM (
            SELECT a AS s FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY s
    )
    SELECT d.s AS suppkey,
           CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM deg d LEFT JOIN cnt ON cnt.s = d.s
"""


@register(
    "q25_supplier_triangles",
    _Q25_ORACLE,
    category="relational",
    doc=(
        "triangle counting on the supplier co-occurrence graph with "
        "DEGREE ORIENTATION (Suri & Vassilvitskii WWW'11): edges = "
        "supplier pairs whose co-order count reaches the P90 of all "
        "pair counts (a relative threshold that self-normalizes graph "
        "density across SFs), each edge oriented low-(degree, id) -> "
        "high so every node's out-degree is O(sqrt(m)) — the wedge "
        "join's fan-out bound that makes triangle listing survive "
        "power-law graphs at scale. The quantile threshold is found "
        "from a count-of-counts histogram (bounded by the distinct "
        "co-order-count values, model-sized) collected once and "
        "re-entering the plan as ONE literal — no global sort. Output: "
        "per-supplier degree + triangle participation, zeros kept for "
        "every edge-incident supplier."
    ),
)
def q25_supplier_triangles(spark, sf_dir):
    # janitor lifetime for pairs/o (r10 ADVICE, measured r11): the
    # in-op eager-checkpoint release cost 2.4 s medians vs 0.6 s —
    # see d18's note; the session janitor reclaims the blocks.
    out, _pairs, _o = _q25_build(spark, sf_dir)
    return out


def _q25_build(spark, sf_dir):
    """The lazy triangle plan plus its persisted intermediates — split
    out so plan gates can inspect the pre-checkpoint plan."""
    lo = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    b = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    # pairs feeds BOTH the histogram collect and the edge filter, and
    # everything downstream fans out (edges 3x, o 3x): persist so the
    # lineitem self-join runs once (recomputable DISK_ONLY — the same
    # lesson the oracle needs MATERIALIZED for: without it DuckDB
    # re-inlines the pair join ~18x inside tri and spills the disk)
    pairs = (
        lo.join(b, (F.col("l_orderkey") == F.col("o2"))
                & (F.col("l_suppkey") < F.col("s2")))
        .groupBy(F.col("l_suppkey").alias("s1"), "s2")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist(StorageLevel.DISK_ONLY)
    # exact P90 threshold WITHOUT a global sort: the count-of-counts
    # histogram is bounded by the number of distinct co-order counts
    # (≤ max pair multiplicity — model-sized), cumulated driver-side
    hist = sorted(
        (r.c, r.k) for r in pairs.groupBy("c").agg(
            F.count(F.lit(1)).alias("k")
        ).collect()
    )
    import math

    n = sum(k for _, k in hist)
    # the SAME IEEE multiply-then-ceil as the oracle's CEIL(q * n) —
    # any pre-scaling would round the product differently on the
    # x.000000000000004-style edges doubles produce
    rank = math.ceil(Q25_EDGE_QUANTILE * n)
    cum, thr = 0, None
    for cval, k in hist:
        cum += k
        if cum >= rank:
            thr = cval
            break
    edges = pairs.filter(F.col("c") >= F.lit(thr)).select("s1", "s2")
    deg = (
        edges.select(F.col("s1").alias("s"))
        .unionByName(edges.select(F.col("s2").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("dd1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("dd2"))
    ed = edges.join(F.broadcast(d1), "s1").join(F.broadcast(d2), "s2")
    lo_first = (F.col("dd1") < F.col("dd2")) | (
        (F.col("dd1") == F.col("dd2")) & (F.col("s1") < F.col("s2"))
    )
    o = ed.select(
        F.when(lo_first, F.col("s1")).otherwise(F.col("s2")).alias("u"),
        F.when(lo_first, F.col("s2")).otherwise(F.col("s1")).alias("v"),
    ).persist(StorageLevel.DISK_ONLY)
    e2 = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = o.join(e2, "v").select("u", "v", "w")
    e3 = o.select(F.col("u"), F.col("v").alias("w"), F.lit(1).alias("hit"))
    tri = wedges.join(e3, ["u", "w"]).select("u", "v", "w")
    cnt = (
        tri.select(F.col("u").alias("s"))
        .unionByName(tri.select(F.col("v").alias("s")))
        .unionByName(tri.select(F.col("w").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.join(cnt, "s", "left")
        .select(
            F.col("s").alias("suppkey"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"),
        )
    )
    return out, pairs, o
