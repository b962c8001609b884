"""Round-12 operators: oracle audit twins for the sketch/hash family +
the binned decision stump.

- d20: SimHash near-dup pipeline audit — the IDENTICAL production
  machinery (vote fold, pigeonhole bands, capped bucket join, exact
  popcount verify) run over sha256-derived 40-bit token hashes, which
  DuckDB replays exactly. d05/d08 keep xxhash64 for production (one
  fewer string pass per token); this converts the SimHash family's
  correctness from rows-only to strict hash-green (VERDICT r11 item 1).
- a19: Count-Min-sketch audit — the a16 sketch build/probe with
  sha256-derived row hashes, counters joined relationally instead of
  re-entering as a literal, so the full counter matrix and every
  estimate is DuckDB-replayable (VERDICT r11 item 4).
- t34: quantile-binned decision stump — t33's exact integer Gini
  argmax restricted to the 15 exact order-statistic boundaries per
  feature (the histogram-binned split search XGBoost/LightGBM run at
  scale, where t33's full distinct-value scan stops being bounded);
  boundaries are rank-defined so the oracle derives them relationally
  (VERDICT r11 item 6).

Reference parity note: the reference (696 LoC chunk store,
/root/reference/src/lib.rs) has no query surface; these extend the
SURVEY §2 LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import register
from ..sources import load_table, spread_scan

# ---------------------------------------------------------------------------
# d20: SimHash pipeline audit (sha256 token hashes → strict oracle)
# ---------------------------------------------------------------------------

#: 40 bits = the established sha-prefix integer both engines derive
#: identically (Spark conv(substr(sha2,1,10),16,10) ↔ DuckDB
#: CAST('0x'||substr(sha256,1,10) AS BIGINT)); 4 even 10-bit pigeonhole
#: blocks guarantee candidate recall 1.0 at Hamming ≤ 3.
D20_BITS = 40
D20_BANDS = 4
D20_MAX_HAMMING = 3
D20_BUCKET_CAP = 4096

_D20_ORACLE = rf"""
    WITH tok AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256(t.tok), 1, 10)) AS BIGINT) AS h
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t(tok)
    ),
    votes AS (
        SELECT doc_id, CAST(u.b AS INTEGER) AS b,
               SUM(CASE WHEN (h >> CAST(u.b AS INTEGER)) & 1 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM tok, UNNEST(range({D20_BITS})) AS u(b)
        GROUP BY doc_id, u.b
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS BIGINT) AS sh
        FROM votes GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, sh, CAST(u.i AS INTEGER) AS band_idx,
               (sh >> (CAST(u.i AS INTEGER) * 10)) & 1023 AS band_val
        FROM fp, UNNEST(range({D20_BANDS})) AS u(i)
    ),
    capped AS (
        SELECT doc_id, sh, band_idx, band_val
        FROM banded
        QUALIFY ROW_NUMBER() OVER (PARTITION BY band_idx, band_val
                                   ORDER BY doc_id) <= {D20_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sh AS fa, b.sh AS fb
        FROM capped a JOIN capped b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {D20_MAX_HAMMING}
"""


def sha40(col):
    """The 40-bit sha256-prefix integer both engines compute identically
    (the smp06/a13 oracle discipline)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 10), 16, 10).cast("long")


@register(
    "d20_simhash_audit",
    _D20_ORACLE,
    category="llm-dedup",
    doc=(
        "oracle-audited twin of the d05/d08 SimHash near-dup pipeline: "
        "the SAME vote→bits fold (simhash_from_token_hashes), the SAME "
        "pigeonhole banding (pigeonhole_bands) and the SAME capped "
        "bucket join + exact popcount verify, run over sha256-derived "
        "40-bit token hashes so DuckDB replays every vote, every "
        "fingerprint bit, every band value and the row_number bucket "
        "cap — the result HASH-MATCHES (v14 recipe, r11 item 1). "
        "4 even 10-bit blocks give pigeonhole-guaranteed recall 1.0 at "
        "Hamming ≤ 3. Production keeps xxhash64 (d05/d08, one fewer "
        "string pass per token); a pytest pins both paths through the "
        "shared machinery and the blocked result equal to brute force. "
        "100 TB: identical shape to d08 — banded equi-join, bucket cap "
        "bounds pair expansion under skew (and the oracle replays the "
        "cap exactly), never O(n^2)."
    ),
)
def d20_simhash_audit(spark, sf_dir):
    from ..functions.dedup import (
        capped_fingerprint_band_pairs,
        hamming64,
        pigeonhole_bands,
        simhash_from_token_hashes,
    )
    from ..functions.text import whitespace_tokens
    from ..sources import spread_scan

    # spread_scan: the token explode + sha fold ran single-task over
    # the single-file scan (r13 profile discipline); no-op at scale
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "doc_id", F.explode(whitespace_tokens("text")).alias("_t")
    ).select("doc_id", sha40(F.col("_t")).alias("_h"))
    sh = simhash_from_token_hashes(toks, "doc_id", "_h", D20_BITS).select(
        "doc_id", F.col("simhash").alias("_sh")
    )
    banded = pigeonhole_bands(sh, "doc_id", "_sh", D20_BITS, D20_BANDS)
    pairs = capped_fingerprint_band_pairs(
        banded, "_sh", "doc_id", D20_BUCKET_CAP
    )
    return pairs.select(
        "id_a",
        "id_b",
        hamming64(F.col("fp_a"), F.col("fp_b")).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= D20_MAX_HAMMING)


# ---------------------------------------------------------------------------
# d21: MinHash LSH pipeline audit (sha256 hash family → strict oracle)
# ---------------------------------------------------------------------------

D21_K = 12
D21_BANDS = 4
D21_ROWS = D21_K // D21_BANDS
D21_BUCKET_CAP = 4096
#: exact-Jaccard admission threshold; the 4-band x 3-row LSH curve has
#: its s-threshold at (1/4)^(1/3) ~ 0.63, so >= 0.5 true pairs are
#: likely to collide in at least one band
D21_JACCARD = 0.5

#: The shingle -> signature -> banding -> candidate -> exact-Jaccard
#: CTE chain, shared by d21's oracle and d23's keep-list audit (wave14)
#: so the two replays can never desynchronize on the candidate
#: machinery.
_D21_CTE_BODY = rf"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[(i+1):(i+3)], ' ')
                          FOR i IN range(len(w)-2)] END AS grams
        FROM w
    ),
    s AS (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
    sig AS (
        SELECT doc_id, u.i AS i,
               MIN(CAST(('0x' || substr(sha256(CAST(u.i AS VARCHAR) || ':' || sh),
                                        1, 10)) AS BIGINT)) AS h
        FROM s, UNNEST(range({D21_K})) AS u(i)
        GROUP BY doc_id, u.i
    ),
    sigstr AS (
        SELECT doc_id, string_agg(CAST(h AS VARCHAR), ':' ORDER BY i) AS sig_str
        FROM sig GROUP BY doc_id
    ),
    bandkey AS (
        SELECT doc_id, CAST(i // {D21_ROWS} AS INTEGER) AS band_idx,
               string_agg(CAST(h AS VARCHAR), ':' ORDER BY i) AS band_val
        FROM sig GROUP BY doc_id, i // {D21_ROWS}
    ),
    capped AS (
        SELECT b.doc_id, b.band_idx, b.band_val, ss.sig_str
        FROM bandkey b JOIN sigstr ss USING (doc_id)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY b.band_idx, b.band_val
                                   ORDER BY b.doc_id) <= {D21_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM capped a JOIN capped b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS ninter
        FROM cand c
        JOIN s sa ON sa.doc_id = c.id_a
        JOIN s sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
        GROUP BY c.id_a, c.id_b
    )"""

_D21_ORACLE = rf"""
    WITH {_D21_CTE_BODY}
    SELECT i.id_a, i.id_b, CAST(i.ninter AS BIGINT) AS n_common,
           -- 6-dp cut via VARCHAR->DECIMAL, NOT ROUND(double, 6): the
           -- shortest-repr HALF_UP rule Spark's double->decimal cast
           -- applies (the v13/t35 discipline; ROUND on raw doubles can
           -- disagree in the last place — ADVICE r12)
           CAST(CAST(CAST(CAST(i.ninter AS DOUBLE)
                          / (za.n + zb.n - i.ninter) AS VARCHAR)
                     AS DECIMAL(18,6)) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sz za ON za.doc_id = i.id_a
    JOIN sz zb ON zb.doc_id = i.id_b
    WHERE CAST(i.ninter AS DOUBLE) / (za.n + zb.n - i.ninter) >= {D21_JACCARD}
"""


def _d21_inter_sz(spark, sf_dir):
    """The shared candidate machinery (shingles -> sha-derived k-MIN
    signatures -> capped band blocking -> per-pair intersection counts
    + per-doc shingle sizes) — d21 verifies symmetric Jaccard on top of
    it, d25 (wave14) asymmetric containment. Returns (inter, sz)."""
    from ..functions.dedup import (
        capped_fingerprint_band_pairs,
        shingles_from_words,
    )

    from ..sources import spread_scan

    d = load_table(spark, sf_dir, "documents")
    sh = (
        # spread_scan (the d03 pattern): single-file scan -> the shingle
        # explode and the 12-way sha signature fold otherwise run as ONE
        # task; no-op at scale
        spread_scan(d, "doc_id")
        .select("doc_id", F.split(F.col("text"), " ").alias("_w"))
        .select(
            "doc_id", F.explode(shingles_from_words(F.col("_w"))).alias("sh")
        )
        .distinct()
        # shingle rows feed the signature fold AND the exact verify
        # (recomputable DISK_ONLY, the a16/r8 lineage rule)
        .persist(StorageLevel.DISK_ONLY)
    )
    aggs = [
        F.min(sha40(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(D21_K)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    sig_str = F.concat_ws(
        ":", *[F.col(f"h{i}").cast("string") for i in range(D21_K)]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{b * D21_ROWS + j}").cast("string")
                        for j in range(D21_ROWS)
                    ],
                ).alias("band_val"),
            )
            for b in range(D21_BANDS)
        ]
    )
    banded = sig.select(
        "doc_id", sig_str.alias("_sig"), F.explode(bands).alias("b")
    ).select(
        "doc_id",
        "_sig",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )
    pairs = capped_fingerprint_band_pairs(
        banded, "_sig", "doc_id", D21_BUCKET_CAP
    ).select("id_a", "id_b")
    sa = sh.select(F.col("doc_id").alias("id_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a").join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return inter, sz


@register(
    "d21_minhash_audit",
    _D21_ORACLE,
    category="llm-dedup",
    doc=(
        "oracle-audited twin of the d04 MinHash LSH near-dup pipeline: "
        "the SAME shingle construction (shingles_from_words 3-gram + "
        "short-doc fallback), the SAME k-MIN-aggregate signature fold "
        "(one groupBy, map-side combinable — minhash_signatures' "
        "shape), the SAME banded blocking with the SAME row_number "
        "bucket cap (capped_fingerprint_band_pairs), and an EXACT "
        "distinct-shingle Jaccard verify — with the hash family "
        "sha256-derived (40-bit prefixes, the d20/v14 discipline) so "
        "DuckDB replays every signature component, band key and cap "
        "decision: the MinHash family's correctness goes strict "
        "hash-green. Production d04 keeps the xxhash64 two-hash "
        "construction (2 hashes/shingle vs k). 12 hashes x 4 bands x 3 "
        "rows put the LSH s-curve threshold at ~0.63; candidates are "
        "admitted at exact Jaccard >= 0.5 (integer intersection counts "
        "over distinct shingles — one relational join, both engines "
        "divide identical integers ONCE). 100 TB: same shape as d04 — "
        "the band equi-join is the only corpus shuffle, bucket caps "
        "bound pair expansion under skew, the verify joins only "
        "candidate pairs (never all pairs)."
    ),
)
def d21_minhash_audit(spark, sf_dir):
    inter, sz = _d21_inter_sz(spark, sf_dir)
    jac = F.col("ninter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("ninter")
    )
    return (
        inter.join(sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .filter(jac >= D21_JACCARD)
        .select(
            "id_a",
            "id_b",
            F.col("ninter").cast("long").alias("n_common"),
            # double->decimal cast, not F.round (see oracle note)
            jac.cast("decimal(18,6)").cast("double").alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# v15: IVF ANN pipeline audit (v13-trained cells → probe → exact rerank)
# ---------------------------------------------------------------------------

V15_NPROBE = 2
V15_TOPK = 5


def _v15_oracle_sql() -> str:
    from .wave11 import KM_ITERS, _km_iter_ctes, _km_oracle_head

    head = _km_oracle_head()
    body = "".join(_km_iter_ctes(i) for i in range(KM_ITERS))
    return head + body + f""",
    ev AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    distF AS (
        SELECT e.vec_id, c.cl,
               SUM((CAST(e.x AS DECIMAL(12,6)) - CAST(c.c AS DECIMAL(12,6)))
                   * (CAST(e.x AS DECIMAL(12,6))
                      - CAST(c.c AS DECIMAL(12,6)))) AS dist
        FROM e JOIN c{KM_ITERS} c USING (d) GROUP BY e.vec_id, c.cl
    ),
    assign AS (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM distF) WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM distF WHERE vec_id < 20) WHERE rn <= {V15_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
        FROM qprobe q JOIN assign a ON a.cl = q.cl
        WHERE a.vec_id <> q.query_id
    ),
    scored AS (
        -- 6-dp cut via VARCHAR->DECIMAL, NOT ROUND(double, 6) (the
        -- v13/t35 discipline — ADVICE r12)
        SELECT cand.query_id, cand.neighbor_id,
               CAST(CAST(CAST(list_dot_product(qv.v, cv.v)
                     / (sqrt(list_dot_product(qv.v, qv.v))
                        * sqrt(list_dot_product(cv.v, cv.v))) AS VARCHAR)
                    AS DECIMAL(18,6)) AS DOUBLE) AS cosine
        FROM cand
        JOIN ev qv ON qv.vec_id = cand.query_id
        JOIN ev cv ON cv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored) WHERE rn <= {V15_TOPK}
    """


@register(
    "v15_ivf_audit",
    _v15_oracle_sql(),
    category="llm-similarity",
    doc=(
        "oracle-audited twin of the IVF ANN family (v04/v09): the "
        "COMPLETE cluster-then-probe pipeline — coarse quantizer "
        "trained by v13's fully-relational k-means (sha-ranked init, "
        "exact-DECIMAL distances, integer-exact 6-dp centroid means — "
        "the machinery already proven bit-identical to its unrolled "
        "HUGEINT/DECIMAL oracle), corpus vectors assigned to their "
        "argmin cell, each query probing its nprobe nearest cells "
        "(same (dist, cl) ranking the oracle replays), candidates "
        "equi-joined on the cell id and reranked EXACTLY (the "
        "v01/v14 fold == list_dot_product cosine, 6-dp cut). Every "
        "stage is deterministic, so the whole ANN path hash-matches — "
        "the last rows-only ANN family member gains a strict oracle "
        "row through its production shape (train → assign → probe → "
        "rerank; v04/v09 keep their production quantizers and recall "
        "trends). 100 TB: identical to v04 — centroid literals "
        "broadcast, the cell equi-join is the only corpus shuffle, "
        "probes scan ~nprobe/k of the corpus per query."
    ),
)
def v15_ivf_audit(spark, sf_dir):
    from .wave11 import (
        KM_ITERS,
        KM_K,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from ..functions.similarity import cosine_sim, to_double_array

    ex = _km_exploded(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    cents = kmeans_train(ex, KM_ITERS)
    # dists feeds BOTH the corpus assignment and the query probes: a
    # persist makes the final-distance agg over ex run once per call,
    # not once per consuming subtree (vec-count-sized frame; r13)
    dists = _km_dists(ex, cents).persist(StorageLevel.DISK_ONLY)
    assign = _km_assign(dists).select(
        F.col("vec_id").alias("neighbor_id"), F.col("cluster").alias("cl")
    )
    long_d = dists.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("cl"),
                        F.col(f"d{j}").alias("dist"),
                    )
                    for j in range(KM_K)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.cl").alias("cl"), F.col("s.dist").alias("dist"))
    wq = W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cl").asc())
    probes = (
        long_d.filter(F.col("vec_id") < 20)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= V15_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cl")
    )
    cand = (
        probes.join(assign, "cl")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    ev = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = ev.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = ev.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            # double->decimal cast, not F.round (see oracle note)
            cosine_sim(F.col("qv"), F.col("cv"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= V15_TOPK)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


# ---------------------------------------------------------------------------
# d22: Bloom decontamination audit (sha256 positions → strict oracle)
# ---------------------------------------------------------------------------

D22_M_BITS = 1 << 20
D22_K = 7

_D22_ORACLE = rf"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(words) < 5 THEN [array_to_string(words, ' ')]
                    ELSE [array_to_string(words[(i+1):(i+5)], ' ')
                          FOR i IN range(len(words)-4)] END AS grams
        FROM w
    ),
    bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
    bpos AS (
        SELECT DISTINCT
               CAST(('0x' || substr(sha256(CAST(u.i AS VARCHAR) || ':' || gram),
                                    1, 10)) AS BIGINT) % {D22_M_BITS} AS p
        FROM bg, UNNEST(range({D22_K})) AS u(i)
    ),
    cg AS (
        SELECT DISTINCT doc_id, unnest(grams) AS gram
        FROM g WHERE doc_id % 20 <> 0
    ),
    cpos AS (
        SELECT doc_id, gram, u.i AS i,
               CAST(('0x' || substr(sha256(CAST(u.i AS VARCHAR) || ':' || gram),
                                    1, 10)) AS BIGINT) % {D22_M_BITS} AS p
        FROM cg, UNNEST(range({D22_K})) AS u(i)
    ),
    hitg AS (
        SELECT c.doc_id, c.gram
        FROM cpos c LEFT JOIN bpos b ON b.p = c.p
        GROUP BY c.doc_id, c.gram
        HAVING COUNT(b.p) = {D22_K}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidate
    FROM hitg GROUP BY doc_id
"""


@register(
    "d22_bloom_audit",
    _D22_ORACLE,
    category="llm-pipeline",
    doc=(
        "oracle-audited twin of d14's Bloom decontamination: the SAME "
        "bloom_decontaminate machinery — distributed bit_or bitmap "
        "build, ~130 KB BinaryType literal re-shipped once, map-side "
        "byte-probe with forall over the k positions, survivors-only "
        "distinct — with the position family sha256-derived "
        "(position_i = sha40('i:'||gram) mod 2^20), which DuckDB "
        "replays as a relational position-set membership check: a "
        "gram is a candidate iff ALL k positions are set, and bitmap-"
        "bit membership == distinct-position-set membership, so the "
        "oracle reproduces every candidate INCLUDING the false "
        "positives — the Bloom family's correctness (bit pack, byte "
        "probe, admission rule) goes strict hash-green (d20/d21/a19 "
        "recipe). Production d14 keeps xxhash64 (one 8-byte gram hash "
        "before the position fan-out). 100 TB: unchanged from d14 — "
        "the bitmap ships once, corpus grams filter map-side, only "
        "survivors shuffle."
    ),
)
def d22_bloom_audit(spark, sf_dir):
    from ..functions.pipeline import bloom_decontaminate

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return bloom_decontaminate(
        corpus, bench, "doc_id", "text",
        n=5, m_bits=D22_M_BITS, k=D22_K, hash_family="sha",
    )


# ---------------------------------------------------------------------------
# a19: Count-Min sketch audit (sha256 row hashes → strict oracle)
# ---------------------------------------------------------------------------

A19_DEPTH = 4
A19_WIDTH = 1024

_A19_ORACLE = rf"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    coords AS (
        SELECT u.j AS j,
               CAST(('0x' || substr(sha256(CAST(u.j AS VARCHAR) || ':' || tok),
                                    1, 10)) AS BIGINT) % {A19_WIDTH} AS cell
        FROM tok, UNNEST(range({A19_DEPTH})) AS u(j)
    ),
    cells AS (
        SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS n
        FROM coords GROUP BY j, cell
    ),
    exact AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n FROM tok GROUP BY tok
    ),
    top AS (
        SELECT tok, exact_n FROM exact
        ORDER BY exact_n DESC, tok ASC LIMIT 20
    ),
    probe AS (
        SELECT t.tok, t.exact_n, u.j AS j,
               CAST(('0x' || substr(sha256(CAST(u.j AS VARCHAR) || ':' || t.tok),
                                    1, 10)) AS BIGINT) % {A19_WIDTH} AS cell
        FROM top t, UNNEST(range({A19_DEPTH})) AS u(j)
    ),
    est AS (
        SELECT p.tok, p.exact_n, MIN(c.n) AS cms_n
        FROM probe p JOIN cells c ON c.j = p.j AND c.cell = p.cell
        GROUP BY p.tok, p.exact_n
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_n DESC, tok ASC) AS BIGINT)
             AS rn,
           tok, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
           CAST(cms_n - exact_n AS BIGINT) AS over
    FROM est
"""


def _a19_cell(j: int, col):
    """CMS row-j bucket for a token: sha256('j:tok') 40-bit prefix mod
    width — independent per row, identical in both engines."""
    return F.pmod(
        sha40(F.concat(F.lit(f"{j}:"), col)), F.lit(A19_WIDTH)
    ).cast("long")


@register(
    "a19_cms_audit",
    _A19_ORACLE,
    category="aggregation",
    doc=(
        "oracle-audited twin of a16's Count-Min sketch: the SAME "
        "depth-4 x width-1024 one-job build (tokens explode to (row, "
        "cell) coords, one groupBy counts every cell) with sha256-"
        "derived row hashes, and estimates probed via a RELATIONAL "
        "broadcast join against the bounded counter frame instead of a "
        "collected literal — every counter and every min-over-rows "
        "estimate is DuckDB-replayable, so the sketch family's "
        "correctness is strict hash-green (r11 item 4). Output: top-20 "
        "exact-heaviest tokens with exact count, CMS estimate and "
        "overestimate (est >= exact by construction — the a16 APPROX "
        "invariant, now hash-checked). 100 TB: cell counts are "
        "partial-agg combinable; the counter frame is <= depth*width "
        "rows (broadcast side); probes never shuffle the corpus."
    ),
)
def a19_cms_audit(spark, sf_dir):
    from ..functions.text import whitespace_tokens

    d = load_table(spark, sf_dir, "documents")
    tok = (
        spread_scan(d, "doc_id")
        .select(F.explode(whitespace_tokens("text")).alias("tok"))
        # one tokenize feeds build + exact counts (recomputable
        # DISK_ONLY, the a16/r8 lineage rule)
        .persist(StorageLevel.DISK_ONLY)
    )
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    _a19_cell(j, F.col("tok")).alias("cell"),
                )
                for j in range(A19_DEPTH)
            ]
        )
    )
    cells = (
        tok.select(coords.alias("rc"))
        .groupBy(F.col("rc.j").alias("j"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    exact = tok.groupBy("tok").agg(
        F.count("*").cast("long").alias("exact_n")
    )
    # top-20 via TakeOrderedAndProject (no global sort); the rank window
    # then runs over exactly 20 rows (the a16/t23 recipe)
    top = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(20)
    probe = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _a19_cell(j, F.col("tok")).alias("cell"),
                    )
                    for j in range(A19_DEPTH)
                ]
            )
        ).alias("pc"),
    ).select("tok", "exact_n", F.col("pc.j").alias("j"), F.col("pc.cell").alias("cell"))
    est = probe.join(F.broadcast(cells), ["j", "cell"]).groupBy(
        "tok", "exact_n"
    ).agg(F.min("n").alias("cms_n"))
    return est.select(
        F.row_number()
        .over(W.orderBy(F.desc("exact_n"), F.asc("tok")))
        .cast("long")
        .alias("rn"),
        "tok",
        "exact_n",
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("over"),
    )


# ---------------------------------------------------------------------------
# q27: weighted label propagation (community detection, exact integers)
# ---------------------------------------------------------------------------

Q27_ITERS = 4


def _q27_iter_ctes(i: int) -> str:
    """One synchronous LPA round: each node adopts the incoming-edge-
    weight-majority label among its in-neighbors (ties → smallest
    label); nodes with no in-edges keep their label. Pure integers."""
    return f""",
    v{i} AS (
        SELECT e.dst AS n, l.lbl, CAST(SUM(e.w) AS HUGEINT) AS wsum
        FROM edges e JOIN l{i} l ON l.n = e.src
        GROUP BY e.dst, l.lbl
    ),
    b{i} AS (
        SELECT n, lbl FROM (
            SELECT n, lbl, ROW_NUMBER() OVER (
                PARTITION BY n ORDER BY wsum DESC, lbl ASC) AS rn
            FROM v{i}) WHERE rn = 1
    ),
    l{i + 1} AS MATERIALIZED (
        SELECT l.n, COALESCE(b.lbl, l.lbl) AS lbl
        FROM l{i} l LEFT JOIN b{i} b ON b.n = l.n
    )"""


def _q27_oracle_sql(iters: int = Q27_ITERS) -> str:
    head = """
    WITH edges AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS HUGEINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY src, dst
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    l0 AS MATERIALIZED (SELECT n, n AS lbl FROM nodes)"""
    body = "".join(_q27_iter_ctes(i) for i in range(iters))
    tail = f""",
    sz AS (
        SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
        FROM l{iters} GROUP BY lbl
    )
    SELECT CAST(l.n AS BIGINT) AS nationkey,
           CAST(l.lbl AS BIGINT) AS community,
           sz.community_size
    FROM l{iters} l JOIN sz ON sz.lbl = l.lbl"""
    return head + body + tail


@register(
    "q27_label_propagation",
    _q27_oracle_sql(),
    category="relational",
    doc=(
        "weighted synchronous label propagation (Raghavan, Albert & "
        "Kumara 2007) over the nation trade graph — community "
        f"detection in the q26 discipline: {Q27_ITERS} rounds, each ONE "
        "distributed (dst, label) weight aggregation over the edge "
        "frame with the label vector re-entering as literals "
        "(model-as-literal), argmax by (weight DESC, label ASC) so "
        "ties are deterministic, nodes without in-edges keep their "
        "label. EVERY step is integer arithmetic (edge-weight sums, "
        "rank ties on ids), so the unrolled HUGEINT oracle is "
        "bit-identical — including on graphs where synchronous LPA "
        "oscillates (the known bipartite-structure property; Raghavan "
        "et al. §3): the fixed round count makes even the oscillating "
        "state deterministic and oracle-replayable. Output: final "
        "community per node + community size. 100 TB: the edge build is one corpus-scale groupBy "
        "(partial-agg combinable, broadcast dims); per round one "
        "edge-frame scan + one (node, label)-sized exchange; driver "
        "state O(nodes) — for web-scale node sets the label literal "
        "becomes a broadcast-joined frame, exactly pagerank_broadcast's "
        "round shape."
    ),
)
def q27_label_propagation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # ONE collect of the nation-keyed edge aggregate (r14, guide §1.1
    # first-principles + §5): the aggregated frame is bounded by the
    # nation KEY DOMAIN (<= 25x25 rows at ANY scale factor), so after
    # the one distributed corpus-scale groupBy the entire LPA fixpoint
    # is O(|edges|) integer arithmetic. The previous shape re-scanned
    # the persisted frame once per round (agg + window + collect jobs of
    # pure scheduling overhead) plus a final node-set distinct. The
    # rounds below execute the IDENTICAL integer vote sums and
    # (wsum DESC, lbl ASC) argmax (Python ints are exact, arbitrary
    # precision), so the result is bit-equal — pinned by
    # test_q27_python_reference and the broadcast-dual test. Web-scale
    # node sets use label_propagation_broadcast (bit-equal, tested),
    # which keeps every round distributed.
    erows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    if not erows:
        return spark.createDataFrame(
            [], "nationkey long, community long, community_size long"
        )
    edges = [(int(r.src), int(r.dst), int(r.w)) for r in erows]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    labels = {n: n for n in nodes}
    for _ in range(Q27_ITERS):
        votes: dict[tuple[int, int], int] = {}
        for s, d, w in edges:
            k = (d, labels[s])
            votes[k] = votes.get(k, 0) + w
        best: dict[int, tuple[int, int]] = {}
        for (d, lbl), ws in votes.items():
            cur = best.get(d)
            if cur is None or ws > cur[0] or (ws == cur[0] and lbl < cur[1]):
                best[d] = (ws, lbl)
        labels = {
            n: (best[n][1] if n in best else labels[n]) for n in nodes
        }
    sizes: dict[int, int] = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    rows = [(n, labels[n], sizes[labels[n]]) for n in nodes]
    return spark.createDataFrame(
        rows, "nationkey long, community long, community_size long"
    )


def label_propagation_broadcast(spark, edges, iters: int = Q27_ITERS):
    """q27's web-scale label path (the pagerank_broadcast pattern): the
    label vector lives in a node-sized DataFrame broadcast-joined onto
    the edge frame each round — never a literal CASE over nodes, so the
    node set can be millions. Bit-equal to the q27 literal path by
    construction: the same (dst, label) weight aggregation, the same
    (weight DESC, label ASC) argmax, no-in-edge nodes keep their label.
    Per round: ONE edge-frame scan + one (node, label)-sized exchange;
    labels localCheckpoint per round so lineage stays flat. At true web
    scale drop the broadcast hint and AQE picks the shuffle join.

    ``edges``: (src, dst, w). Returns q27's exact output schema.
    """
    ew = edges.persist(StorageLevel.DISK_ONLY)
    nodes = (
        ew.select(F.col("src").alias("n"))
        .unionByName(ew.select(F.col("dst").alias("n")))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    if nodes.count() == 0:
        ew.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return spark.createDataFrame(
            [], "nationkey long, community long, community_size long"
        )
    labels = nodes.select(
        "n", F.col("n").cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        # DECIMAL(38,0) vote sums: at the web scale this path targets,
        # a hot (dst, label) pair's edge-weight sum can exceed 2^63 and
        # non-ANSI LONG wraps silently, corrupting the argmax (ADVICE
        # r12). Decimal sums are exact to 38 digits; ordering semantics
        # are unchanged.
        votes = (
            ew.join(F.broadcast(labels), ew["src"] == labels["n"])
            .groupBy("dst", "lbl")
            .agg(F.sum(F.col("w").cast("decimal(38,0)")).alias("wsum"))
        )
        wv = W.partitionBy("dst").orderBy(
            F.col("wsum").desc(), F.col("lbl").asc()
        )
        best = (
            votes.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select(F.col("dst"), F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(best, labels["n"] == best["dst"], "left")
            .select(
                "n",
                F.coalesce("new_lbl", "lbl").cast("long").alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    out = labels.join(F.broadcast(sizes), "lbl").select(
        F.col("n").cast("long").alias("nationkey"),
        F.col("lbl").alias("community"),
        "community_size",
    )
    ew.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# t35: BM25 full-text ranking (the retrieval scorer, exact cross-engine)
# ---------------------------------------------------------------------------

T35_TERMS = ("join", "hash", "spark")
T35_K1 = 1.2
T35_B = 0.75
T35_TOPK = 20

_T35_ORACLE = rf"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM w),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) AS sdl
        FROM dl
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM w),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE tok IN {tuple(T35_TERMS)!r} GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    term_score AS (
        -- 9-dp cut via VARCHAR->DECIMAL, NOT ROUND(double, 9): DuckDB's
        -- VARCHAR of a double is the shortest round-trip repr and the
        -- DECIMAL parse rounds it HALF_UP — the identical rule Spark's
        -- double->decimal cast applies (the v13/_km_exploded lesson;
        -- ROUND on raw doubles can disagree in the last place)
        SELECT tf.doc_id,
               CAST(CAST(
                   ln((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * ({T35_K1} + 1.0))
                   / (CAST(tf.tf AS DOUBLE)
                      + {T35_K1} * (1.0 - {T35_B}
                                    + {T35_B} * CAST(dl.dl AS DOUBLE)
                                      / (CAST(s.sdl AS DOUBLE)
                                         / CAST(s.n AS DOUBLE))))
                   AS VARCHAR) AS DECIMAL(18,9)) AS ts
        FROM tf
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN df ON df.tok = tf.tok
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT doc_id, SUM(ts) AS s FROM term_score GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(ROUND(s, 6) AS DOUBLE) AS bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS BIGINT)
             AS rn
    FROM scored
    QUALIFY rn <= {T35_TOPK}
"""


@register(
    "t35_bm25_search",
    _T35_ORACLE,
    category="llm-text",
    doc=(
        "BM25 full-text ranking (Robertson & Zaragoza's Okapi BM25, "
        "the retrieval scorer every curation/RAG pipeline runs beside "
        "its vector index): top-{k} documents for a fixed term set, "
        "k1={k1}, b={b}, idf = ln((N-df+0.5)/(df+0.5)+1). Exact "
        "cross-engine by the repo's float discipline: every per-term "
        "partial score is ONE double expression over identical integer "
        "inputs (tf, df, dl, N, Σdl — so both engines execute the "
        "same IEEE ops in the same order; the t10 logprob precedent "
        "for ln), rounded to a 9-dp DECIMAL, and the per-document SUM "
        "runs over DECIMALS — order-independent, so partitioning can "
        "never change the hash. 100 TB: tf is one partial-agg groupBy "
        "over the (tiny) query-term subset of the token stream, df and "
        "the corpus stats are scalar-sized broadcasts, top-k is "
        "rank-limited — the classic inverted-index scoring plan "
        "expressed relationally.".format(
            k=T35_TOPK, k1=T35_K1, b=T35_B
        )
    ),
)
def t35_bm25_search(spark, sf_dir):
    from ..functions.text import whitespace_tokens

    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", whitespace_tokens("text").alias("toks"))
    dl = w.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sdl"),
    )
    tok = w.select("doc_id", F.explode("toks").alias("tok"))
    tf = (
        tok.filter(F.col("tok").isin(*T35_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ts = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            # 9-dp cut via double->decimal cast (shortest-repr HALF_UP,
            # matching the oracle's VARCHAR->DECIMAL — the v13 lesson)
            (
                F.log(
                    (F.col("n").cast("double") - F.col("df").cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                    + 1.0
                )
                * (F.col("tf").cast("double") * (T35_K1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + T35_K1
                    * (
                        1.0
                        - T35_B
                        + T35_B
                        * F.col("dl").cast("double")
                        / (F.col("sdl").cast("double") / F.col("n").cast("double"))
                    )
                )
            )
            .cast("decimal(18,9)")
            .alias("ts"),
        )
    )
    scored = ts.groupBy("doc_id").agg(F.sum("ts").alias("s"))
    top = scored.orderBy(F.col("s").desc(), F.col("doc_id").asc()).limit(
        T35_TOPK
    )
    return top.select(
        "doc_id",
        F.round("s", 6).cast("double").alias("bm25"),
        F.row_number()
        .over(W.orderBy(F.col("s").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rn"),
    )


# ---------------------------------------------------------------------------
# t34: quantile-binned decision stump (t33 at production row counts)
# ---------------------------------------------------------------------------

#: number of bins; thresholds are the 15 interior exact order
#: statistics (rank ceil(i*n/16)) per feature.
T34_BINS = 16


def _t34_oracle_sql() -> str:
    # the feat -> cum chain is the SAME CTE TEXT t33's oracle uses
    # (T33_CUM_CTES), so a change to t33's feature definitions can
    # never silently desynchronize t34's oracle (ADVICE r12)
    from .wave12 import T33_CUM_CTES, T33_SCALE

    return f"""
    WITH {T33_CUM_CTES},
    bnd AS (
        SELECT feature, u.i AS i, MIN(x) AS x
        FROM cum, UNNEST(range(1, {T34_BINS})) AS u(i)
        WHERE nl >= (CAST(u.i AS HUGEINT) * n + {T34_BINS - 1}) // {T34_BINS}
        GROUP BY feature, u.i
    ),
    bx AS (SELECT DISTINCT feature, x FROM bnd),
    scored AS (
        SELECT c.feature, c.x AS threshold,
               ({T33_SCALE} * ((n - nl) * ((nl - c1l) * (nl - c1l)
                                           + c1l * c1l)
                 + nl * (((n - nl) - (c1t - c1l)) * ((n - nl) - (c1t - c1l))
                         + (c1t - c1l) * (c1t - c1l))))
               // (nl * (n - nl)) AS score_fp,
               nl, c1l, n, c1t
        FROM cum c JOIN bx ON bx.feature = c.feature AND bx.x = c.x
        WHERE c.nl > 0 AND c.nl < c.n
    ),
    best AS (
        SELECT * FROM scored
        ORDER BY score_fp DESC, feature ASC, threshold ASC LIMIT 1
    )
    SELECT f.doc_id,
           b.feature,
           CAST(b.threshold AS BIGINT) AS threshold,
           CAST(b.score_fp AS BIGINT) AS score_fp,
           CAST(CASE WHEN (CASE b.feature
                           WHEN 'n_chars' THEN f.n_chars
                           WHEN 'n_tok' THEN f.n_tok
                           ELSE f.n_punct END) <= b.threshold
                THEN CASE WHEN 2 * b.c1l > b.nl THEN 1 ELSE 0 END
                ELSE CASE WHEN 2 * (b.c1t - b.c1l) > (b.n - b.nl)
                          THEN 1 ELSE 0 END
                END AS BIGINT) AS predicted,
           CAST(f.y AS BIGINT) AS label
    FROM feat f, best b
    """


@register(
    "t34_binned_stump",
    _t34_oracle_sql(),
    category="text",
    doc=(
        "quantile-binned CART decision stump — t33's exact integer Gini "
        "argmax restricted to the {b}-1 interior exact order-statistic "
        "boundaries per feature (threshold i = the value at rank "
        "ceil(i*n/{b})): the histogram-binned split search every "
        "distributed GBDT (XGBoost approx / LightGBM) runs when the "
        "full distinct-value scan of t33 stops being bounded (SCALE.md "
        "r11: exact holds to ~1e5 distinct values/side). Boundaries "
        "are RANK-defined, so both engines derive them relationally "
        "from the same cumulative histogram — no driver-computed "
        "literal enters the oracle, and the whole search stays in "
        "integer/decimal arithmetic (hash-exact). 100 TB: one "
        "per-(feature,value) histogram (partial-agg combinable), one "
        "window over distinct values, a {b}-row-per-feature boundary "
        "frame, shuffle-free literal prediction.".format(b=T34_BINS)
    ),
)
def t34_binned_stump(spark, sf_dir):
    from .wave12 import _t33_features, t33_score_fp_sql

    feat = _t33_features(
        load_table(spark, sf_dir, "documents")
    ).persist(StorageLevel.DISK_ONLY)
    long_f = None
    for fname in ("n_chars", "n_tok", "n_punct"):
        part = feat.select(
            "doc_id", "y", F.lit(fname).alias("feature"),
            F.col(fname).alias("x"),
        )
        long_f = part if long_f is None else long_f.unionByName(part)
    per_val = long_f.groupBy("feature", "x").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("c1")
    )
    wcum = W.partitionBy("feature").orderBy("x")
    wall = W.partitionBy("feature")
    cum = per_val.select(
        "feature",
        "x",
        F.sum("cnt").over(wcum).alias("nl"),
        F.sum("c1").over(wcum).alias("c1l"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("c1").over(wall).alias("c1t"),
    )
    bins = spark.range(1, T34_BINS).select(F.col("id").alias("i"))
    bnd = (
        cum.crossJoin(F.broadcast(bins))
        .filter(F.col("nl") >= F.expr(f"(i * n + {T34_BINS - 1}) div {T34_BINS}"))
        .groupBy("feature", "i")
        .agg(F.min("x").alias("x"))
    )
    bx = bnd.select("feature", "x").distinct()
    scored = (
        cum.join(bx, ["feature", "x"])
        .filter((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
        .selectExpr(
            "feature", "x AS threshold", t33_score_fp_sql(),
            "nl", "c1l", "n", "c1t",
        )
    )
    best = (
        scored.orderBy(
            F.col("score_fp").desc(),
            F.col("feature").asc(),
            F.col("threshold").asc(),
        )
        .limit(1)
        .collect()[0]
    )
    left_label = 1 if 2 * int(best.c1l) > int(best.nl) else 0
    right_label = (
        1
        if 2 * (int(best.c1t) - int(best.c1l)) > (int(best.n) - int(best.nl))
        else 0
    )
    fx = F.col(best.feature)
    # janitor lifetime for feat (the q26/t33 note)
    return feat.select(
        "doc_id",
        F.lit(best.feature).alias("feature"),
        F.lit(int(best.threshold)).cast("long").alias("threshold"),
        F.lit(int(best.score_fp)).cast("long").alias("score_fp"),
        F.when(fx <= int(best.threshold), F.lit(left_label))
        .otherwise(F.lit(right_label))
        .cast("long")
        .alias("predicted"),
        F.col("y").alias("label"),
    )
