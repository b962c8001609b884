"""Round-13 operators: the IVF+PQ strict audit (the last production ANN
path without a hash-green oracle row) and the remaining audit twins.

- v16: the COMPLETE IVF+PQ pipeline (v09's shape) made bit-exact: v13's
  relational k-means trains the coarse quantizer, PQ codebooks train on
  cell residuals with the SAME integer-exact 6-dp Lloyd update, the
  corpus encodes to per-subspace argmin codes, each query builds an
  asymmetric-distance lookup table per probed cell, ADC shortlists by
  exact-DECIMAL sums, and the exact fold-cosine reranks — every stage
  DuckDB-replayable (VERDICT r12 item 1).

Reference parity note: the reference (696 LoC chunk store,
/root/reference/src/lib.rs) has no query surface; these extend the
SURVEY §2 LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# v16: IVF+PQ pipeline audit (residual PQ -> ADC shortlist -> exact rerank)
# ---------------------------------------------------------------------------

from .wave11 import KM_DIM, KM_ITERS, KM_K  # noqa: E402  (shared quantizer config)

V16_NSUB = 4
V16_SUBDIM = KM_DIM // V16_NSUB  # 16
#: PQ codebook size. MUST equal KM_K: the oracle reuses the k-means
#: head's sha-ranked `init` CTE as the PQ init (the same first-KM_K
#: digest-ranked vectors seed both quantizers).
V16_CODES = KM_K
V16_PQ_ITERS = 2
V16_NPROBE = 2
#: ADC shortlist width. The audit's 4-code-per-subspace books (tied to
#: KM_K for the shared sha-ranked init) are a coarse quantizer on the
#: near-unclusterable gaussian corpus, so the refine stage carries the
#: recall (v09's r9 lesson: refine width, not cell recall, is the
#: binding constraint); rerank cost stays refine*|queries| rows.
V16_REFINE = 100
V16_TOPK = 5


def _v16_pq_iter_ctes(i: int) -> str:
    """One unrolled PQ Lloyd round for the DuckDB oracle — the k-means
    `_km_iter_ctes` recipe with the extra subspace key: exact DECIMAL
    subvector distances, (dist, j) argmin per (vec_id, m), and the
    integer-exact 6-dp half-away mean per (m, j, ds); empty codes carry
    b{i} forward."""
    return f""",
    pd{i} AS MATERIALIZED (
        SELECT r.vec_id, r.m, b.j,
               SUM((CAST(r.r AS DECIMAL(12,6)) - CAST(b.c AS DECIMAL(12,6)))
                   * (CAST(r.r AS DECIMAL(12,6))
                      - CAST(b.c AS DECIMAL(12,6)))) AS dist
        FROM res r JOIN b{i} b ON b.m = r.m AND b.ds = r.ds
        GROUP BY r.vec_id, r.m, b.j
    ),
    pa{i} AS MATERIALIZED (
        SELECT vec_id, m, j FROM (
            SELECT vec_id, m, j, ROW_NUMBER() OVER (
                PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
            FROM pd{i}) WHERE rn = 1
    ),
    b{i + 1} AS MATERIALIZED (
        SELECT b.m, b.j, b.ds, COALESCE(u.c2, b.c) AS c
        FROM b{i} b LEFT JOIN (
            SELECT m, j, ds,
                   (CASE WHEN s6 < 0 THEN -1 ELSE 1 END)
                   * ((2 * abs(s6) + n) // (2 * n)) / 1000000.0 AS c2
            FROM (
                SELECT pa.m, pa.j, r.ds,
                       CAST(SUM(CAST(r.r AS DECIMAL(18,6))) * 1000000
                            AS HUGEINT) AS s6,
                       COUNT(*) AS n
                FROM pa{i} pa JOIN res r
                  ON r.vec_id = pa.vec_id AND r.m = pa.m
                GROUP BY pa.m, pa.j, r.ds
            )
        ) u ON u.m = b.m AND u.j = b.j AND u.ds = b.ds
    )"""


def _v16_oracle_sql() -> str:
    from .wave11 import _km_iter_ctes, _km_oracle_head

    head = _km_oracle_head()
    km = "".join(_km_iter_ctes(i) for i in range(KM_ITERS))
    prelude = head + km + f""",
    distF AS MATERIALIZED (
        SELECT e.vec_id, c.cl,
               SUM((CAST(e.x AS DECIMAL(12,6)) - CAST(c.c AS DECIMAL(12,6)))
                   * (CAST(e.x AS DECIMAL(12,6))
                      - CAST(c.c AS DECIMAL(12,6)))) AS dist
        FROM e JOIN c{KM_ITERS} c USING (d) GROUP BY e.vec_id, c.cl
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM distF) WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM distF WHERE vec_id < 20) WHERE rn <= {V16_NPROBE}
    ),
    res AS MATERIALIZED (
        -- cell residual, exact: both operands are 6-dp DECIMALs, the
        -- difference is an exact DECIMAL(13,6) round-tripped through
        -- DOUBLE (identically in both engines)
        SELECT e.vec_id,
               CAST((e.d - 1) // {V16_SUBDIM} AS INTEGER) AS m,
               CAST((e.d - 1) % {V16_SUBDIM} + 1 AS INTEGER) AS ds,
               CAST(CAST(e.x AS DECIMAL(12,6))
                    - CAST(c.c AS DECIMAL(12,6)) AS DOUBLE) AS r
        FROM e JOIN assign a USING (vec_id)
        JOIN c{KM_ITERS} c ON c.cl = a.cl AND c.d = e.d
    ),
    b0 AS MATERIALIZED (
        -- PQ init: the same sha-ranked init vectors as the coarse
        -- quantizer, sliced per subspace (j = digest rank; V16_CODES
        -- == KM_K makes the head's init CTE reusable verbatim)
        SELECT r.m, i.cl AS j, r.ds, r.r AS c
        FROM init i JOIN res r USING (vec_id)
    )"""
    pq = "".join(_v16_pq_iter_ctes(i) for i in range(V16_PQ_ITERS))
    P = V16_PQ_ITERS
    return prelude + pq + f""",
    pdF AS MATERIALIZED (
        SELECT r.vec_id, r.m, b.j,
               SUM((CAST(r.r AS DECIMAL(12,6)) - CAST(b.c AS DECIMAL(12,6)))
                   * (CAST(r.r AS DECIMAL(12,6))
                      - CAST(b.c AS DECIMAL(12,6)))) AS dist
        FROM res r JOIN b{P} b ON b.m = r.m AND b.ds = r.ds
        GROUP BY r.vec_id, r.m, b.j
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, m, j AS code FROM (
            SELECT vec_id, m, j, ROW_NUMBER() OVER (
                PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
            FROM pdF) WHERE rn = 1
    ),
    qres AS (
        -- query residual against the PROBED cell's centroid (ADC is
        -- asymmetric: the query side re-centres per probed cell)
        SELECT q.query_id, q.cl,
               CAST((e.d - 1) // {V16_SUBDIM} AS INTEGER) AS m,
               CAST((e.d - 1) % {V16_SUBDIM} + 1 AS INTEGER) AS ds,
               CAST(CAST(e.x AS DECIMAL(12,6))
                    - CAST(c.c AS DECIMAL(12,6)) AS DOUBLE) AS r
        FROM qprobe q
        JOIN e ON e.vec_id = q.query_id
        JOIN c{KM_ITERS} c ON c.cl = q.cl AND c.d = e.d
    ),
    lut AS MATERIALIZED (
        SELECT qr.query_id, qr.cl, qr.m, b.j,
               SUM((CAST(qr.r AS DECIMAL(12,6)) - CAST(b.c AS DECIMAL(12,6)))
                   * (CAST(qr.r AS DECIMAL(12,6))
                      - CAST(b.c AS DECIMAL(12,6)))) AS v
        FROM qres qr JOIN b{P} b ON b.m = qr.m AND b.ds = qr.ds
        GROUP BY qr.query_id, qr.cl, qr.m, b.j
    ),
    candpq AS (
        SELECT q.query_id, q.cl, a.vec_id AS neighbor_id
        FROM qprobe q JOIN assign a ON a.cl = q.cl
        WHERE a.vec_id <> q.query_id
    ),
    adc AS (
        SELECT c.query_id, c.neighbor_id, SUM(l.v) AS adc
        FROM candpq c
        JOIN codes k ON k.vec_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id AND l.cl = c.cl
                  AND l.m = k.m AND l.j = k.code
        GROUP BY c.query_id, c.neighbor_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY adc ASC, neighbor_id ASC) AS srn
            FROM adc) WHERE srn <= {V16_REFINE}
    ),
    ev AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
        -- 6-dp cut via VARCHAR->DECIMAL, NOT ROUND(double, 6) (the
        -- v13/t35 discipline)
        SELECT s.query_id, s.neighbor_id,
               CAST(CAST(CAST(list_dot_product(qv.v, cv.v)
                     / (sqrt(list_dot_product(qv.v, qv.v))
                        * sqrt(list_dot_product(cv.v, cv.v))) AS VARCHAR)
                    AS DECIMAL(18,6)) AS DOUBLE) AS cosine
        FROM short s
        JOIN ev qv ON qv.vec_id = s.query_id
        JOIN ev cv ON cv.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored) WHERE rn <= {V16_TOPK}
    """


def _v16_residuals(ex, cents, assign):
    """(vec_id, m, ds, r): exact 6-dp cell residuals in subspace layout.
    m = 0-based subspace, ds = 1-based dimension within the subspace."""
    from ..functions.similarity import lit_matrix

    lit_c = lit_matrix([cents[j] for j in range(KM_K)])
    cexp = F.element_at(
        F.element_at(lit_c, (F.col("cluster") + 1).cast("int")),
        F.col("d").cast("int"),
    )
    return (
        ex.join(assign, "vec_id")
        .select(
            "vec_id",
            F.expr(f"cast((d - 1) div {V16_SUBDIM} as int)").alias("m"),
            F.expr(f"cast((d - 1) % {V16_SUBDIM} + 1 as int)").alias("ds"),
            (
                F.col("x").cast("decimal(12,6)") - cexp.cast("decimal(12,6)")
            )
            .cast("double")
            .alias("r"),
        )
    )


def _v16_init_books(res, ex) -> list[list[list[float]]]:
    """books[m][j][ds-1]: the j-th sha-ranked vector's subspace-m
    residual slice — the PQ analog of `_km_init` (and the identical
    digest ranking, so the oracle reuses the head's `init` CTE)."""
    # ONE collect (the _km_init discipline, shared helper): ship the
    # top-V16_CODES vectors' residual rows with their digests in one job
    from .wave11 import _sha_topk_rows

    rows, ids = _sha_topk_rows(res, ex, V16_CODES)
    by_id: dict = {
        i: [[0.0] * V16_SUBDIM for _ in range(V16_NSUB)] for i in ids
    }
    for r in rows:
        by_id[r.vec_id][r.m][r.ds - 1] = r.r
    return [[by_id[i][m] for i in ids] for m in range(V16_NSUB)]


def _v16_pq_dist_aggs(books) -> list:
    """The code-distance aggregate columns (pd0..pdN): codebooks are one
    nested [m][j][ds] literal; arithmetic is pure exact DECIMAL (the
    `_km_dists` discipline)."""
    from ..functions.similarity import lit_matrix

    lit_b = lit_matrix(books)
    aggs = []
    for j in range(V16_CODES):
        bexp = F.element_at(
            F.element_at(F.element_at(lit_b, F.col("m") + 1), j + 1),
            F.col("ds"),
        )
        diff = F.col("r").cast("decimal(12,6)") - bexp.cast("decimal(12,6)")
        aggs.append(F.sum(diff * diff).alias(f"pd{j}"))
    return aggs


def _v16_pq_dists(res, books):
    """One (vec_id, m)-keyed aggregation computing ALL code distances."""
    return res.groupBy("vec_id", "m").agg(*_v16_pq_dist_aggs(books))


def _v16_pq_argmin(pd_df):
    """Argmin over the code distance columns; lowest code id on ties
    (the oracle's ORDER BY dist, j)."""
    from .wave11 import _km_argmin_col

    code, _ = _km_argmin_col(V16_CODES, "pd")
    return pd_df.select("vec_id", "m", code.cast("int").alias("code"))


def _v16_pq_train(res, books) -> list[list[list[float]]]:
    """Relational PQ Lloyd's: per round ONE fused (vec_id, m)-keyed
    pass over res (code distances + argmin + carried (ds, r) rows — the
    `kmeans_train` r14 fusion, keyed by subspace) feeding one
    (m, code, ds) integer-exact 6-dp mean; empty codes keep their
    previous word. Driver state is n_sub*n_codes*sub_dim rounded
    doubles per round. The re-exploded list hands the mean exactly the
    row multiset the res-join-argmin form produced; DECIMAL sums are
    order-independent, so codebooks are bit-identical to the oracle's
    joined replay."""
    from .wave11 import _km_argmin_col

    for _ in range(V16_PQ_ITERS):
        fused = res.groupBy("vec_id", "m").agg(
            *_v16_pq_dist_aggs(books),
            F.collect_list(F.struct("ds", "r")).alias("_pts"),
        )
        code, _ = _km_argmin_col(V16_CODES, "pd")
        assigned = fused.select(
            "m", code.cast("int").alias("code"), "_pts"
        )
        upd = (
            assigned.select("m", "code", F.explode("_pts").alias("_p"))
            .select(
                "m", "code",
                F.col("_p.ds").alias("ds"), F.col("_p.r").alias("r"),
            )
            .groupBy("m", "code", "ds")
            .agg(
                (F.sum(F.col("r").cast("decimal(18,6)")) * 1000000)
                .cast("long")
                .alias("s6"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "m",
                "code",
                "ds",
                (
                    F.when(F.col("s6") < 0, -1).otherwise(1)
                    * F.expr("(2 * abs(s6) + n) div (2 * n)")
                    / F.lit(1000000.0)
                ).alias("c"),
            )
            .collect()
        )
        nxt = [[list(word) for word in bm] for bm in books]
        for r in upd:
            nxt[r.m][r.code][r.ds - 1] = float(r.c)
        books = nxt
    return books


@register(
    "v16_ivfpq_audit",
    _v16_oracle_sql(),
    category="llm-similarity",
    doc=(
        "oracle-audited twin of the IVF+PQ ANN path (v09): the COMPLETE "
        "compressed-index pipeline — coarse quantizer trained by v13's "
        "bit-exact relational k-means (v15's replayed prelude), PQ "
        "codebooks trained on CELL RESIDUALS by the same integer-exact "
        "6-dp relational Lloyd's (one (vec_id, subspace) aggregation "
        "per round, sha-ranked init shared with the coarse init), the "
        "corpus ENCODED to per-subspace argmin codes, each query "
        "building one asymmetric-distance lookup table per probed cell "
        "(exact DECIMAL subvector distances), ADC = the sum of "
        "LUT[m][code_m] over subspaces (pure decimal addition — the "
        "dim-independent candidate scan that is PQ's entire point), "
        "top-REFINE shortlist, exact fold-cosine rerank (6-dp decimal "
        "cut). EVERY stage is deterministic integer/decimal "
        "arithmetic, so the full train->encode->probe->ADC->rerank "
        "path hash-matches its unrolled DuckDB replay — the last "
        "production ANN family member gains a strict oracle row "
        "(VERDICT r12 item 1); v09 keeps its production quantizers and "
        "recall trends. 100 TB: identical to v09 — codebooks/centroids "
        "are literal model state, codes are ~32x smaller than floats "
        "so shards stay executor-resident, the cell equi-join is the "
        "only corpus shuffle, ADC cost is decoupled from dim, exact "
        "math runs on refine*|queries| rows only."
    ),
)
def v16_ivfpq_audit(spark, sf_dir):
    from .wave11 import _km_assign, _km_dists, _km_exploded, kmeans_train
    from ..functions.similarity import (
        cosine_sim,
        lit_matrix,
        to_double_array,
    )

    ex = _km_exploded(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    cents = kmeans_train(ex, KM_ITERS)
    # dists feeds the assignment (res, cand, codes subtrees) AND the
    # query probes: persist so the final-distance agg over ex runs once
    # per call (vec-count-sized frame; r13)
    dists = _km_dists(ex, cents).persist(StorageLevel.DISK_ONLY)
    assign = _km_assign(dists).select("vec_id", "cluster")
    res = _v16_residuals(ex, cents, assign).persist(StorageLevel.DISK_ONLY)
    books = _v16_pq_train(res, _v16_init_books(res, ex))
    codes = _v16_pq_argmin(_v16_pq_dists(res, books))

    # query probes: nprobe nearest cells by the SAME (dist, cl) ranking
    # the oracle replays (v15's probe shape)
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
        .filter(F.col("rn") <= V16_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cl")
    )

    # query residuals against each PROBED cell's centroid -> per-cell
    # ADC lookup tables (one (query, cl, m)-keyed aggregation)
    lit_c = lit_matrix([cents[j] for j in range(KM_K)])
    lit_b = lit_matrix(books)
    qcexp = F.element_at(
        F.element_at(lit_c, (F.col("cl") + 1).cast("int")),
        F.col("d").cast("int"),
    )
    qres = (
        probes.join(
            ex.select(F.col("vec_id").alias("query_id"), "d", "x"),
            "query_id",
        )
        .select(
            "query_id",
            "cl",
            F.expr(f"cast((d - 1) div {V16_SUBDIM} as int)").alias("m"),
            F.expr(f"cast((d - 1) % {V16_SUBDIM} + 1 as int)").alias("ds"),
            (
                F.col("x").cast("decimal(12,6)") - qcexp.cast("decimal(12,6)")
            )
            .cast("double")
            .alias("r"),
        )
    )
    lut_aggs = []
    for j in range(V16_CODES):
        bexp = F.element_at(
            F.element_at(F.element_at(lit_b, F.col("m") + 1), j + 1),
            F.col("ds"),
        )
        diff = F.col("r").cast("decimal(12,6)") - bexp.cast("decimal(12,6)")
        lut_aggs.append(F.sum(diff * diff).alias(f"lv{j}"))
    lutw = (
        qres.groupBy("query_id", "cl", "m")
        .agg(*lut_aggs)
        .select(
            "query_id",
            "cl",
            "m",
            F.array(*[F.col(f"lv{j}") for j in range(V16_CODES)]).alias(
                "lut"
            ),
        )
    )

    # ADC shortlist: candidates equi-join the probed cell, each scored
    # by n_sub LUT lookups summed as exact decimals
    cand = (
        probes.join(
            assign.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("cluster").alias("cl"),
            ),
            "cl",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "cl", "neighbor_id")
    )
    adc = (
        cand.join(
            codes.select(
                F.col("vec_id").alias("neighbor_id"), "m", "code"
            ),
            "neighbor_id",
        )
        .join(lutw, ["query_id", "cl", "m"])
        .select(
            "query_id",
            "neighbor_id",
            F.element_at("lut", F.col("code") + 1).alias("term"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("term").alias("adc"))
    )
    ws = W.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= V16_REFINE)
        .select("query_id", "neighbor_id")
    )

    # exact rerank on raw doubles (v01/v15 fold cosine, 6-dp decimal cut)
    ev = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = ev.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = ev.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # janitor lifetime for ex/res (the q26/t33 note)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= V16_TOPK)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


# ---------------------------------------------------------------------------
# m09: perceptual-hash pipeline audit (relational char-grid aHash)
# ---------------------------------------------------------------------------

#: 63 grid cells = bits 0..62: the top bit stays clear, so the whole
#: fingerprint is non-negative in both engines and the PRODUCTION
#: 64-bit band layout (offsets/widths below) replays with plain >> and
#: & on signed BIGINTs — no sign-bit special-casing anywhere.
M09_CELLS = 63


def _m09_oracle_sql() -> str:
    from ..functions.multimodal import (
        PHASH_BANDS,
        PHASH_HAMMING_MAX,
        _PHASH_BAND_OFFSETS,
        _PHASH_BAND_WIDTHS,
    )

    band_values = ", ".join(
        f"({k}, {_PHASH_BAND_OFFSETS[k]}, {_PHASH_BAND_WIDTHS[k]})"
        for k in range(PHASH_BANDS)
    )
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               upper(substr(text, 1, 3)) || substr(text, 4)
        FROM documents
    ),
    chars AS (
        SELECT doc_id,
               (CAST(t.p AS BIGINT) * {M09_CELLS}) // length(text) AS b,
               CAST(ord(substr(text, CAST(t.p AS INTEGER) + 1, 1))
                    AS BIGINT) AS v
        FROM corpus, UNNEST(range(length(text))) AS t(p)
    ),
    blocks AS (
        SELECT doc_id, b, SUM(v) AS s, COUNT(*) AS c
        FROM chars GROUP BY doc_id, b
    ),
    wb AS (
        SELECT doc_id, b, s, c,
               SUM(s) OVER (PARTITION BY doc_id) AS st,
               SUM(c) OVER (PARTITION BY doc_id) AS ct
        FROM blocks
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s * ct > st * c
                             THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
        FROM wb GROUP BY doc_id
    ),
    banded AS (
        SELECT f.doc_id, f.ph, b.band_idx,
               (f.ph >> b.off) & ((CAST(1 AS BIGINT) << b.w) - 1)
                 AS band_val
        FROM fp f CROSS JOIN (VALUES {band_values}) AS b(band_idx, off, w)
    ),
    capped AS (
        SELECT doc_id, ph, band_idx, band_val
        FROM banded
        QUALIFY ROW_NUMBER() OVER (PARTITION BY band_idx, band_val
                                   ORDER BY doc_id) <= 4096
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.ph AS fa, b.ph AS fb
        FROM capped a JOIN capped b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    ham AS (
        SELECT id_a, id_b, bit_count(xor(fa, fb)) AS hamming
        FROM cand WHERE bit_count(xor(fa, fb)) <= {PHASH_HAMMING_MAX}
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(id_a) AS BIGINT) AS first_a,
           CAST(MAX(id_b) AS BIGINT) AS last_b
    FROM ham GROUP BY hamming
    """


@register(
    "m09_phash_audit",
    _m09_oracle_sql(),
    category="llm-multimodal",
    doc=(
        "oracle-audited twin of the m06 perceptual-hash near-dup "
        "pipeline: the SAME banding machinery (phash_near_pairs — the "
        "production 7-uneven-band layout, the row_number bucket cap, "
        "the exact bit_count Hamming verify, all replayed by the "
        "oracle) over a RELATIONAL character-grid aHash the oracle "
        "derives too: each doc's code points fall into 63 equal "
        "position blocks (b = p*63 div n — 63 cells keep the "
        "fingerprint non-negative so signed shifts agree), bit b set "
        "iff the block's mean exceeds the doc mean, compared "
        "cross-multiplied in exact integers (s*ct > st*c — no "
        "division). The corpus is m06's exact shape: every document "
        "plus a perturbed re-encode (first 3 chars case-flipped, ids "
        "+1e6), so real near-dup structure is found, not planted "
        "trivially. Production m06 keeps the Arrow mapInPandas "
        "byte-grid aHash over binary payloads (the decode stub's "
        "domain); both paths run through the ONE shared "
        "phash_near_pairs (same function, same band constants — the "
        "oracle's band table is GENERATED from the production "
        "_PHASH_BAND_OFFSETS/_PHASH_BAND_WIDTHS, so they cannot "
        "diverge). Output: m06's "
        "per-Hamming-distance pair profile. 100 TB: identical shape "
        "to m06 — one char-explode groupBy per doc (partial-agg "
        "combinable), banded equi-join with capped buckets, never "
        "O(n^2)."
    ),
)
def m09_phash_audit(spark, sf_dir):
    from ..functions.multimodal import phash_near_pairs
    from ..sources import spread_scan

    # spread_scan: the per-CHARACTER explode below multiplies the
    # single-task scan ~500x; parallelize it up front (no-op at scale)
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    base = d.select("doc_id", "text")
    replay = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.upper(F.substring("text", 1, 3)),
            F.expr("substring(text, 4)"),
        ).alias("text"),
    )
    corpus = base.unionByName(replay)
    chars = (
        corpus.select(
            "doc_id",
            F.length("text").cast("long").alias("n"),
            F.posexplode(F.split("text", "")).alias("p", "ch"),
        )
        # Spark's regex split can emit a trailing '' element; drop it so
        # positions 0..n-1 carry exactly the n characters both engines
        # enumerate
        .filter(F.col("ch") != "")
        .select(
            "doc_id",
            F.expr(f"(cast(p as bigint) * {M09_CELLS}) div n").alias("b"),
            F.ascii("ch").cast("long").alias("v"),
        )
    )
    blocks = chars.groupBy("doc_id", "b").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    wdoc = W.partitionBy("doc_id")
    wb = blocks.select(
        "doc_id",
        "b",
        "s",
        "c",
        F.sum("s").over(wdoc).alias("st"),
        F.sum("c").over(wdoc).alias("ct"),
    )
    bit = (F.col("s") * F.col("ct")) > (F.col("st") * F.col("c"))
    fp = (
        wb.select(
            "doc_id",
            F.when(
                bit,
                F.expr("shiftleft(cast(1 as bigint), cast(b as int))"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("t"),
        )
        .groupBy("doc_id")
        .agg(F.sum("t").cast("long").alias("phash"))
    )
    pairs = phash_near_pairs(fp)
    return (
        pairs.groupBy(F.col("hamming").cast("long").alias("hamming"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("id_a").cast("long").alias("first_a"),
            F.max("id_b").cast("long").alias("last_b"),
        )
        .orderBy("hamming")
    )


# ---------------------------------------------------------------------------
# d23: near-dup keep-list audit (LSH pairs -> CC -> min-id survivor)
# ---------------------------------------------------------------------------


def _d23_oracle_sql() -> str:
    from .wave13 import _D21_CTE_BODY, D21_JACCARD

    return rf"""
    WITH RECURSIVE {_D21_CTE_BODY},
    adm AS (
        SELECT i.id_a, i.id_b
        FROM inter i
        JOIN sz za ON za.doc_id = i.id_a
        JOIN sz zb ON zb.doc_id = i.id_b
        WHERE CAST(i.ninter AS DOUBLE) / (za.n + zb.n - i.ninter)
              >= {D21_JACCARD}
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM adm
        UNION
        SELECT id_b, id_a FROM adm
    ),
    walk(node, label) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.a, w2.label FROM edges e JOIN walk w2 ON e.b = w2.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
    assigned AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_rep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, CAST(cluster_rep AS BIGINT) AS cluster_rep,
           CAST(doc_id = cluster_rep AS INT) AS keep
    FROM assigned
    """


@register(
    "d23_keeplist_audit",
    _d23_oracle_sql(),
    category="llm-dedup",
    doc=(
        "oracle-audited twin of the d13 end-to-end near-dedup "
        "keep-list: d21's sha-derived MinHash LSH candidates (the SAME "
        "shingle/signature/banding/cap/exact-Jaccard machinery, "
        "admitted at J >= 0.5) feed the PRODUCTION connected-components "
        "operator (pointer-jumping min-label propagation, "
        "functions/graph.py), and every document keeps its cluster's "
        "minimum id — the full LSH -> CC -> survivor pipeline replays "
        "in DuckDB (pairs via the shared d21 CTE chain, components via "
        "the d10 recursive-CTE reachability fixpoint, the same min-id "
        "election), so transitive-collapse correctness goes strict "
        "hash-green (VERDICT r12 item 4). Production d13 keeps the "
        "xxhash64 d04 candidate generator. 100 TB: composition of two "
        "verified scale shapes — the banded equi-join is the only "
        "corpus shuffle, CC rounds shuffle node/label ids with "
        "two-phase MINs, O(log d) rounds."
    ),
)
def d23_keeplist_audit(spark, sf_dir):
    from ..functions.graph import connected_components
    from .wave13 import d21_minhash_audit

    pairs = d21_minhash_audit(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id").join(
        comp.select(F.col("node").alias("doc_id"), "component"),
        "doc_id",
        "left",
    )
    rep = F.coalesce(F.col("component"), F.col("doc_id"))
    return out.select(
        "doc_id",
        rep.cast("long").alias("cluster_rep"),
        (rep == F.col("doc_id")).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# d24: SemDeDup audit (v13 clusters -> exact within-cluster cosine prune)
# ---------------------------------------------------------------------------

#: similarity threshold for the audit. The gaussian test embeddings
#: have no planted near-dup mass (max pairwise cosine ~0.51, p99
#: ~0.29), so the production 0.97 would never fire the drop rule; 0.3
#: exercises it on ~1% of pairs while remaining a high-similarity cut
#: on this corpus. d11 keeps the published SemDeDup 0.97.
D24_THRESHOLD = 0.3
#: the audited slice: the deterministic sha-prefix QUARTER (hex
#: '0'-'3') — the v14 cost-bounding discipline; the within-cluster
#: pair expansion is the quadratic stage, and the machinery is
#: fraction-invariant.
D24_SLICE = ("0", "1", "2", "3")


def _d24_oracle_sql() -> str:
    from .wave11 import KM_ITERS, _km_iter_ctes, _km_oracle_head

    head = _km_oracle_head()
    km = "".join(_km_iter_ctes(i) for i in range(KM_ITERS))
    slice_in = ", ".join(f"'{c}'" for c in D24_SLICE)
    cos = """CAST(CAST(CAST(list_dot_product(va.v, vb.v)
                     / (sqrt(list_dot_product(va.v, va.v))
                        * sqrt(list_dot_product(vb.v, vb.v))) AS VARCHAR)
                    AS DECIMAL(18,6)) AS DOUBLE)"""
    return head + km + f""",
    distF AS MATERIALIZED (
        SELECT e.vec_id, c.cl,
               SUM((CAST(e.x AS DECIMAL(12,6)) - CAST(c.c AS DECIMAL(12,6)))
                   * (CAST(e.x AS DECIMAL(12,6))
                      - CAST(c.c AS DECIMAL(12,6)))) AS dist
        FROM e JOIN c{KM_ITERS} c USING (d) GROUP BY e.vec_id, c.cl
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist ASC, cl ASC) AS rn
            FROM distF) WHERE rn = 1
    ),
    sl AS MATERIALIZED (
        SELECT vec_id, cl FROM assign
        WHERE substr(sha256(CAST(vec_id AS VARCHAR)), 1, 1) IN ({slice_in})
    ),
    ev AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id AS id_b
        FROM sl a JOIN sl b ON a.cl = b.cl AND a.vec_id < b.vec_id
        JOIN ev va ON va.vec_id = a.vec_id
        JOIN ev vb ON vb.vec_id = b.vec_id
        WHERE {cos} >= {D24_THRESHOLD}
    )
    SELECT s.vec_id, CAST(s.cl AS BIGINT) AS cluster_id,
           CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS INT) AS keep
    FROM sl s LEFT JOIN dropped d ON d.id_b = s.vec_id
    """


@register(
    "d24_semdedup_audit",
    _d24_oracle_sql(),
    category="llm-dedup",
    doc=(
        "oracle-audited twin of the d11 SemDeDup pipeline (Abbas et "
        "al. 2023): cluster the embedding space with v13's bit-exact "
        "relational k-means (the v15/v16 replayed prelude — same "
        "sha-ranked init, exact-DECIMAL distances, integer-exact 6-dp "
        "means), then WITHIN each cluster drop every vector with a "
        "higher-similarity smaller-id neighbor — the pairwise stage "
        "confined to the cluster equi-join exactly like production, "
        "with the cosine computed as the exact fold == "
        "list_dot_product identity (6-dp decimal cut, the v01/v14 "
        "pin) instead of the Arrow matmul, so EVERY drop decision "
        "replays in DuckDB and the semantic-dedup family gains a "
        "strict hash-green row (VERDICT r12 item 5). The audited "
        "slice is the deterministic sha-prefix quarter (v14 "
        "discipline) because the within-cluster pair expansion is the "
        "quadratic stage; the machinery is fraction-invariant and d11 "
        "keeps the production threshold + Arrow-matmul path. 100 TB: "
        "identical shape to d11 — one shuffle on cluster id, pairwise "
        "work O(sum of cluster sizes squared) by construction, never "
        "a global cross join."
    ),
)
def d24_semdedup_audit(spark, sf_dir):
    from .wave11 import (
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from ..functions.similarity import cosine_sim, to_double_array

    ex = _km_exploded(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    cents = kmeans_train(ex, KM_ITERS)
    assign = _km_assign(_km_dists(ex, cents)).select("vec_id", "cluster")
    sl = assign.filter(
        F.substring(F.sha2(F.col("vec_id").cast("string"), 256), 1, 1).isin(
            *D24_SLICE
        )
    )
    ev = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    a = sl.select(F.col("vec_id").alias("id_a"), F.col("cluster").alias("cl"))
    b = sl.select(F.col("vec_id").alias("id_b"), F.col("cluster").alias("cl"))
    cos = (
        cosine_sim(F.col("va"), F.col("vb"))
        .cast("decimal(18,6)")
        .cast("double")
    )
    dropped = (
        a.join(b, "cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(ev.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(ev.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .filter(cos >= D24_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    # janitor lifetime for ex (the q26/t33 note)
    return (
        sl.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster_id"),
            F.when(F.col("_dropped").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# a20: relational HyperLogLog audit (the last sketch family goes strict)
# ---------------------------------------------------------------------------

A20_B = 8
A20_M = 1 << A20_B  # 256 registers
#: alpha_256 = 0.7213 / (1 + 1.079/m) as the EXACT rational
#: (0.7213 * m * 10^4) / ((m + 1.079) * 10^4), so the raw estimate
#: alpha * m^2 / Z reduces to one integer division both engines
#: truncate identically (Z = Zint / 2^33 with Zint integral).
_A20_ALPHA_NUM = 1846528  # 0.7213 * 256 * 10^4
_A20_ALPHA_DEN = 2570790  # (256 + 1.079) * 10^4
A20_NUM = _A20_ALPHA_NUM * A20_M * A20_M * (1 << 33)
#: Flajolet et al.'s small-range threshold 2.5 * m
A20_SMALL = 5 * A20_M // 2

_A20_ORACLE = rf"""
    WITH tok AS (
        SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    hh AS (
        SELECT lang, CAST(('0x' || substr(sha256(tok), 1, 10)) AS BIGINT) AS h
        FROM tok
    ),
    rb AS (
        SELECT lang, h >> 32 AS bucket,
               CASE WHEN (h & 4294967295) = 0 THEN 33
                    ELSE 33 - length(ltrim(bin(h & 4294967295), '0'))
                    END AS rho
        FROM hh
    ),
    regs AS (SELECT lang, bucket, MAX(rho) AS m FROM rb GROUP BY lang, bucket),
    regs2 AS (
        SELECT lang, bucket, m FROM regs
        UNION ALL
        SELECT 'ALL', bucket, MAX(m) FROM regs GROUP BY bucket
    ),
    langs AS (SELECT DISTINCT lang FROM regs2),
    grid AS (
        SELECT l.lang, CAST(u.b AS BIGINT) AS bucket
        FROM langs l, UNNEST(range({A20_M})) AS u(b)
    ),
    filled AS (
        SELECT g.lang, g.bucket, COALESCE(r.m, 0) AS m
        FROM grid g LEFT JOIN regs2 r
          ON r.lang = g.lang AND r.bucket = g.bucket
    ),
    z AS (
        SELECT lang,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - m AS INTEGER))
                    AS BIGINT) AS zint,
               CAST(COUNT(*) FILTER (m = 0) AS BIGINT) AS v
        FROM filled GROUP BY lang
    ),
    ex AS (
        SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
        FROM tok GROUP BY lang
    ),
    ex2 AS (
        SELECT * FROM ex
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT tok) AS BIGINT) FROM tok
    ),
    est AS (
        SELECT z.lang, e.exact_distinct,
               CAST('{A20_NUM}' AS HUGEINT)
                 // (CAST({_A20_ALPHA_DEN} AS HUGEINT)
                     * CAST(zint AS HUGEINT)) AS e_fp,
               z.v
        FROM z JOIN ex2 e ON e.lang = z.lang
    )
    SELECT lang, exact_distinct,
           CASE WHEN e_fp <= {A20_SMALL} AND v > 0
                THEN {float(A20_M)!r} * ln({float(A20_M)!r}
                                           / CAST(v AS DOUBLE))
                ELSE CAST(e_fp AS DOUBLE) END AS hll_estimate,
           v AS empty_buckets
    FROM est
"""


@register(
    "a20_hll_audit",
    _A20_ORACLE,
    category="aggregation",
    doc=(
        "oracle-audited twin of a11's HyperLogLog distinct rollup — the "
        "LAST sketch family without a strict row (r12 verdict called "
        "the engine HLL non-replayable; a RELATIONAL HLL over "
        "sha256-derived hashes is): 40-bit sha prefix splits into an "
        "8-bit register index and a 32-bit suffix whose leading-zero "
        "rank is the classic rho (computed by exact integer bit-length "
        "— length(conv(w,10,2)) == length(ltrim(bin(w),'0')), pinned "
        "equal), registers are one MAX per (lang, bucket), and the "
        "ALL row is a TRUE register-wise-max MERGE of the per-lang "
        "registers (the mergeable-sketch property a11 demonstrates, "
        "relationally). The Flajolet raw estimate alpha*m^2/Z reduces "
        "to ONE exact integer division (Z's denominator is 2^33, "
        "alpha the exact rational 1846528/2570790), and the "
        "small-range linear-counting branch m*ln(m/V) is one double "
        "expression over identical integers — so every register, "
        "every Z, every estimate replays bit-exact in DuckDB. "
        "Estimates carry the exact distinct count beside them (the "
        "observable HLL error, ~1.04/sqrt(256) = 6.5%). Production "
        "a11 keeps the engine hll_sketch_agg (binary sketches, "
        "hll_union_agg merge). 100 TB: registers are a bounded "
        "(groups x 256)-row frame from one partial-agg-combinable "
        "MAX; merge never re-scans data — sketch once, merge anywhere."
    ),
)
def a20_hll_audit(spark, sf_dir):
    from ..functions.text import whitespace_tokens
    from .wave13 import sha40

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(whitespace_tokens("text")).alias("tok")
    ).persist(StorageLevel.DISK_ONLY)
    h = sha40(F.col("tok"))
    w = h.bitwiseAND(F.lit((1 << 32) - 1))
    rho = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    rb = tok.select(
        "lang",
        F.shiftrightunsigned(h, 32).alias("bucket"),
        rho.cast("int").alias("rho"),
    )
    regs = rb.groupBy("lang", "bucket").agg(F.max("rho").alias("m"))
    regs_all = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .select(F.lit("ALL").alias("lang"), "bucket", "m")
    )
    regs2 = regs.unionByName(regs_all)
    langs = regs2.select("lang").distinct()
    buckets = spark.range(A20_M).select(F.col("id").alias("bucket"))
    filled = (
        langs.crossJoin(F.broadcast(buckets))
        .join(regs2, ["lang", "bucket"], "left")
        .select("lang", "bucket", F.coalesce("m", F.lit(0)).alias("m"))
    )
    z = filled.groupBy("lang").agg(
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), cast(33 - m as int))")
        ).alias("zint"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    ex = tok.groupBy("lang").agg(
        F.countDistinct("tok").cast("long").alias("exact_distinct")
    )
    ex_all = tok.agg(
        F.countDistinct("tok").cast("long").alias("exact_distinct")
    ).select(F.lit("ALL").alias("lang"), "exact_distinct")
    est = z.join(ex.unionByName(ex_all), "lang").withColumn(
        "e_fp",
        F.expr(
            f"CAST('{A20_NUM}' AS DECIMAL(38,0)) div "
            f"(CAST({_A20_ALPHA_DEN} AS DECIMAL(38,0))"
            f" * CAST(zint AS DECIMAL(38,0)))"
        ),
    )
    he = F.when(
        (F.col("e_fp") <= F.lit(A20_SMALL)) & (F.col("v") > 0),
        F.lit(float(A20_M))
        * F.log(F.lit(float(A20_M)) / F.col("v").cast("double")),
    ).otherwise(F.col("e_fp").cast("double"))
    # janitor lifetime for tok (the a16/r8 lineage rule)
    return est.select(
        "lang",
        "exact_distinct",
        he.alias("hll_estimate"),
        F.col("v").alias("empty_buckets"),
    )


# ---------------------------------------------------------------------------
# t36: winnowing fingerprint audit (Schleimer et al. 2003, strict oracle)
# ---------------------------------------------------------------------------

T36_K = 5  # char-gram width (t05's)
T36_W = 8  # winnowing window: guarantee = matches of length >= w+k-1 share a fingerprint
#: positions pack into the low bits of the (hash, rightmost-tie) key;
#: 2^20 chars bounds the doc length (corpus max is 577)
_T36_PBITS = 20
_T36_PCAP = 1 << _T36_PBITS

_T36_ORACLE = rf"""
    WITH base AS (
        SELECT doc_id,
               lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS norm
        FROM documents
    ),
    pos AS (
        SELECT doc_id, greatest(length(norm) - {T36_K - 1}, 1) AS np,
               CAST(u.i AS BIGINT) + 1 AS p, norm
        FROM base,
             UNNEST(range(greatest(length(norm) - {T36_K - 1}, 1))) AS u(i)
    ),
    keyed AS (
        SELECT doc_id, np, p,
               (CAST(('0x' || substr(sha256(substr(norm, CAST(p AS INTEGER),
                                                   {T36_K})), 1, 10))
                     AS BIGINT) << {_T36_PBITS})
               + ({_T36_PCAP} - p) AS key
        FROM pos
    ),
    winmin AS (
        SELECT doc_id, np, p,
               MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                              ROWS BETWEEN CURRENT ROW
                              AND {T36_W - 1} FOLLOWING) AS wkey
        FROM keyed
    ),
    sel AS (
        SELECT DISTINCT doc_id, wkey FROM winmin
        WHERE p <= greatest(np - {T36_W} + 1, 1)
    ),
    dec AS (SELECT doc_id, wkey >> {_T36_PBITS} AS h FROM sel)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
           CAST(MIN(h) AS BIGINT) AS min_fp,
           CAST(MAX(h) AS BIGINT) AS max_fp,
           CAST(SUM(h) AS BIGINT) AS fp_sum
    FROM dec GROUP BY doc_id
"""


@register(
    "t36_winnow_audit",
    _T36_ORACLE,
    category="llm-text",
    doc=(
        "oracle-audited TRUE winnowing fingerprint (Schleimer, "
        "Wilkerson & Aiken, SIGMOD'03 — the fingerprinting family's "
        "published algorithm; t05 ships the min-of-rolling-hash lite "
        "variant, property-tested): every window of {w} consecutive "
        "char-{k}-gram hashes selects its minimum with the RIGHTMOST "
        "tie-break, and the distinct selected (hash, position) pairs "
        "are the document's fingerprint set — guaranteeing any "
        "substring match of length >= w+k-1 shares a fingerprint. The "
        "argmin is ONE windowed MIN over a packed (hash << {pb}) + "
        "({pc} - position) key (rightmost tie = smallest packed key), "
        "identical in both engines, over sha256-derived 40-bit gram "
        "hashes — so the fingerprint family gains a strict hash-green "
        "row. Output per doc: fingerprint count, min/max fingerprint "
        "and the order-independent fingerprint sum. 100 TB: one "
        "char-position explode per doc, one doc-partitioned window "
        "pass, one distinct — no joins, no pair expansion; density is "
        "2/(w+1) of positions by the published bound.".format(
            w=T36_W, k=T36_K, pb=_T36_PBITS, pc=_T36_PCAP
        )
    ),
)
def t36_winnow_audit(spark, sf_dir):
    from .wave13 import sha40

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.lower(
            F.regexp_replace("text", r"[^a-zA-Z0-9 ]", "")
        ).alias("_norm"),
    )
    np_ = F.greatest(F.length("_norm") - (T36_K - 1), F.lit(1))
    pos = base.select(
        "doc_id",
        np_.alias("np"),
        "_norm",
        F.explode(F.sequence(F.lit(1), np_)).alias("p"),
    )
    h = sha40(F.expr(f"substring(_norm, p, {T36_K})"))
    keyed = pos.select(
        "doc_id",
        "np",
        "p",
        (
            F.shiftleft(h, _T36_PBITS) + (F.lit(_T36_PCAP) - F.col("p"))
        ).alias("key"),
    )
    wspec = (
        W.partitionBy("doc_id").orderBy("p").rowsBetween(0, T36_W - 1)
    )
    sel = (
        keyed.select(
            "doc_id", "np", "p", F.min("key").over(wspec).alias("wkey")
        )
        .filter(
            F.col("p") <= F.greatest(F.col("np") - T36_W + 1, F.lit(1))
        )
        .select("doc_id", "wkey")
        .distinct()
    )
    hdec = F.shiftrightunsigned(F.col("wkey"), _T36_PBITS)
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.min(hdec).cast("long").alias("min_fp"),
        F.max(hdec).cast("long").alias("max_fp"),
        F.sum(hdec).cast("long").alias("fp_sum"),
    )


# ---------------------------------------------------------------------------
# q28: single-source shortest paths (Bellman-Ford rounds, exact integers)
# ---------------------------------------------------------------------------

Q28_ROUNDS = 4
Q28_SOURCE = 0
#: per-edge cost = reciprocal trade popularity in fixed point: popular
#: routes are cheap, so min-cost routing can prefer two popular hops
#: over one unpopular direct edge — integer-exact in both engines.
Q28_COST_NUM = 1_000_000
Q28_INF = 10**15


def _q28_iter_ctes(i: int) -> str:
    """One synchronous Bellman-Ford relaxation as CTE text: d_{i+1}(v) =
    min(d_i(v), min over in-edges (u,v) of d_i(u) + cost(u,v)). Pure
    integer min-plus; unreachable stays at the INF literal."""
    return f""",
    relax{i} AS (
        SELECT e.dst AS n, MIN(d.d + e.c) AS cand
        FROM edges e JOIN dist{i} d ON d.n = e.src
        WHERE d.d < {Q28_INF}
        GROUP BY e.dst
    ),
    dist{i + 1} AS MATERIALIZED (
        SELECT d.n, LEAST(d.d, COALESCE(r.cand, d.d)) AS d
        FROM dist{i} d LEFT JOIN relax{i} r ON r.n = d.n
    )"""


def _q28_oracle_sql() -> str:
    head = f"""
    WITH edges AS MATERIALIZED (
        SELECT src, dst, CAST({Q28_COST_NUM} AS BIGINT) // w AS c FROM (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY src, dst
        )
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    dist0 AS MATERIALIZED (
        SELECT n, CAST(CASE WHEN n = {Q28_SOURCE} THEN 0
                            ELSE {Q28_INF} END AS BIGINT) AS d
        FROM nodes
    )"""
    body = "".join(_q28_iter_ctes(i) for i in range(Q28_ROUNDS))
    tail = f"""
    SELECT CAST(n AS BIGINT) AS nationkey, CAST(d AS BIGINT) AS cost_fp
    FROM dist{Q28_ROUNDS} WHERE d < {Q28_INF}"""
    return head + body + tail


def _q28_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select("src", "dst", F.expr(f"cast({Q28_COST_NUM} as bigint) div w").alias("c"))
    )


@register(
    "q28_sssp_bellman_ford",
    _q28_oracle_sql(),
    category="relational",
    doc=(
        "single-source shortest paths over the nation trade graph "
        "(Bellman-Ford, the classic relational SSSP — the graph "
        "primitive q26/q27/d10/q25 didn't cover): per-edge cost = "
        f"{Q28_COST_NUM} div weight (reciprocal trade popularity, "
        "fixed-point), so min-cost routing can prefer two popular hops "
        f"over one unpopular direct edge. {Q28_ROUNDS} synchronous "
        "relaxation rounds in the q26/q27 discipline — each ONE "
        "(dst)-keyed min-plus aggregation over the edge frame with the "
        "distance vector re-entering as literals (model-as-literal, "
        "driver state O(nodes)) — and EVERY step is integer arithmetic, "
        "so the unrolled oracle is bit-identical. Unreachable nodes "
        "stay at the INF literal and are excluded. 100 TB: the edge "
        "build is one corpus-scale groupBy (partial-agg combinable, "
        "broadcast dims); per round one edge-frame scan + one "
        "node-sized exchange; for web-scale node sets the literal "
        "becomes a broadcast-joined frame — `sssp_broadcast` below, "
        "pinned bit-equal."
    ),
)
def q28_sssp_bellman_ford(spark, sf_dir):
    # ONE collect of the nation-keyed edge aggregate (r14, guide §1.1
    # first-principles + §5): the aggregated frame is bounded by the
    # nation KEY DOMAIN (<= 25x25 rows at ANY scale factor — it does not
    # grow with the corpus), so after the one distributed corpus-scale
    # groupBy the whole fixpoint is O(|edges|) integer arithmetic. The
    # previous shape re-scanned the persisted frame once per round
    # (profiled: ~8 collect jobs of 0.1-0.3 s pure scheduling at sf0.1)
    # plus a final node-set distinct; the relax rounds below execute the
    # IDENTICAL integer min-plus (Python ints are exact), so the result
    # is bit-equal — pinned by test_q28_equals_python_bellman_ford and
    # the broadcast-dual test. Web-scale node sets use sssp_broadcast
    # (bit-equal, tested), which keeps every round distributed.
    erows = _q28_edges(spark, sf_dir).collect()
    if not erows:
        return spark.createDataFrame([], "nationkey long, cost_fp long")
    edges = [(int(r.src), int(r.dst), int(r.c)) for r in erows]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    dist = {n: (0 if n == Q28_SOURCE else Q28_INF) for n in nodes}
    for _ in range(Q28_ROUNDS):
        cand: dict[int, int] = {}
        for s, d, c in edges:
            du = dist[s]
            if du < Q28_INF:
                v = du + c
                if v < cand.get(d, Q28_INF):
                    cand[d] = v
        dist = {n: min(dv, cand.get(n, dv)) for n, dv in dist.items()}
    rows = [(n, dist[n]) for n in nodes if dist[n] < Q28_INF]
    return spark.createDataFrame(rows, "nationkey long, cost_fp long")


def sssp_broadcast(spark, edges, source: int = Q28_SOURCE,
                   rounds: int = Q28_ROUNDS):
    """q28's web-scale path (the pagerank_broadcast pattern): the
    distance vector lives in a node-sized DataFrame broadcast-joined
    onto the edge frame each round — never a literal CASE, so the node
    set can be millions. Bit-equal to the literal path by construction
    (same integer min-plus, same INF sentinel). ``edges``: (src, dst,
    c). Returns q28's exact output schema."""
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
        return spark.createDataFrame([], "nationkey long, cost_fp long")
    dist = nodes.select(
        "n",
        F.when(F.col("n") == source, F.lit(0))
        .otherwise(F.lit(Q28_INF))
        .cast("long")
        .alias("d"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relax = (
            ew.join(F.broadcast(dist), ew["src"] == dist["n"])
            .filter(F.col("d") < Q28_INF)
            .groupBy("dst")
            .agg(F.min(F.col("d") + F.col("c")).alias("cand"))
        )
        dist = (
            dist.join(relax, dist["n"] == relax["dst"], "left")
            .select(
                "n",
                F.least(F.col("d"), F.coalesce("cand", "d"))
                .cast("long")
                .alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    out = dist.filter(F.col("d") < Q28_INF).select(
        F.col("n").cast("long").alias("nationkey"),
        F.col("d").alias("cost_fp"),
    )
    ew.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# w20: per-key linear interpolation onto a dense time grid
# ---------------------------------------------------------------------------

_W20_ORACLE = """
    WITH obs AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS v
        FROM events WHERE user_id < 20 GROUP BY user_id, h
    ),
    b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id),
    g AS (
        SELECT user_id,
               CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS TIMESTAMP) AS h
        FROM b
    ),
    j AS (
        SELECT g.user_id, g.h, o.v,
               epoch_us(g.h) // 3600000000 AS hi
        FROM g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
    ),
    w AS (
        SELECT user_id, h, v, hi,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS)
                 OVER wp AS pt,
               first_value(v IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS)
                 OVER wf AS nt
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h,
           CAST(CAST(CAST(
               CASE WHEN v IS NOT NULL THEN v
                    ELSE pv + (nv - pv) * (CAST(hi - pt AS DOUBLE)
                                           / CAST(nt - pt AS DOUBLE)) END
               AS VARCHAR) AS DECIMAL(18,6)) AS DOUBLE) AS value,
           CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
    FROM w
"""


@register(
    "w20_linear_interpolation",
    _W20_ORACLE,
    category="windows",
    doc=(
        "per-key LINEAR interpolation onto a dense hourly grid — the "
        "interpolating complement of w08's as-of carry (the standard "
        "time-series feature-prep pair): sparse per-user hourly means "
        "(user_id < 20 keeps each timeline genuinely gappy) land on a "
        "per-user min..max hour grid; missing hours take "
        "v0 + (v1-v0)*(t-t0)/(t1-t0) between the bracketing "
        "observations. Exact cross-engine: hourly means are "
        "DECIMAL-sum/count doubles (the a10/w10 trick), hour indexes "
        "are integer epoch-microsecond divisions, and the interpolation "
        "is ONE double expression over those identical inputs, cut to "
        "6 dp via the decimal cast (never ROUND). Bracketing values "
        "come from two ignorenulls window passes (last-before / "
        "first-after) — no self-join, one user_id exchange. Grid size "
        "is O(keys x span) from per-key BOUNDS, independent of event "
        "count. 100 TB: identical shape — bounds aggregate, "
        "sequence-explode grid, left join on the aggregated keys, two "
        "window passes."
    ),
)
def w20_linear_interpolation(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sx"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("user_id", "h", (F.col("sx") / F.col("cnt")).alias("v"))
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = grid.join(obs, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        "v",
        F.expr("unix_micros(h) div 3600000000").alias("hi"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    hi_obs = F.when(F.col("v").isNotNull(), F.col("hi"))
    w_ = j.select(
        "user_id",
        "h",
        "v",
        "hi",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(hi_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(hi_obs, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("hi") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return w_.select(
        "user_id",
        "h",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("value"),
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .otherwise(F.lit("interp"))
        .alias("src"),
    )


# ---------------------------------------------------------------------------
# q29: k-core decomposition (fixed-k synchronous peeling, exact integers)
# ---------------------------------------------------------------------------

Q29_K = 15
Q29_ROUNDS = 4


def _q29_iter_ctes(i: int) -> str:
    """One synchronous peel round: degree within the surviving
    subgraph, then drop nodes below k. Pure integer counting."""
    return f""",
    deg{i} AS (
        SELECT e.a AS n, CAST(COUNT(*) AS BIGINT) AS d
        FROM sym e
        JOIN alive{i} x ON x.n = e.a
        JOIN alive{i} y ON y.n = e.b
        GROUP BY e.a
    ),
    alive{i + 1} AS MATERIALIZED (
        SELECT n FROM deg{i} WHERE d >= {Q29_K}
    )"""


def _q29_oracle_sql() -> str:
    head = f"""
    WITH raw AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY src, dst
    ),
    sym AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM raw WHERE src <> dst
            UNION ALL
            SELECT dst, src FROM raw WHERE src <> dst
        )
    ),
    alive0 AS MATERIALIZED (SELECT DISTINCT a AS n FROM sym)"""
    body = "".join(_q29_iter_ctes(i) for i in range(Q29_ROUNDS))
    tail = f"""
    SELECT CAST(d.n AS BIGINT) AS nationkey, d.d AS core_degree
    FROM deg{Q29_ROUNDS - 1} d JOIN alive{Q29_ROUNDS} a ON a.n = d.n"""
    return head + body + tail


@register(
    "q29_kcore",
    _q29_oracle_sql(),
    category="relational",
    doc=(
        f"k-core decomposition (k={Q29_K}) of the undirected nation "
        "trade graph — the density-peeling graph primitive (Seidman "
        "1983; the standard spam/boilerplate community filter in "
        f"web-graph curation): {Q29_ROUNDS} synchronous peel rounds, "
        "each ONE degree aggregation over the surviving subgraph "
        "followed by the threshold drop, in the q26/q27/q28 "
        "discipline (alive set as literals, driver state O(nodes), "
        "every step integer counting so the unrolled oracle is "
        "bit-identical). The fixed round count makes the result "
        "deterministic even mid-peel; a pytest asserts the fixpoint "
        "is actually reached on every test corpus (the peel converges "
        "in <= 3 rounds on the trade graph). Output: surviving nodes "
        "with their within-core degree. 100 TB: the edge build is one "
        "corpus-scale groupBy; per round one edge-frame scan + one "
        "node-sized exchange; the alive literal becomes a broadcast "
        "semi-join frame at web scale (the established broadcast-dual "
        "pattern)."
    ),
)
def q29_kcore(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # symmetrize in ONE pass (r14, the connected_components fix): the
    # unionByName form referenced ``raw`` twice, so the corpus-scale
    # 4-way join ran twice before the persist could populate (profiled
    # as a 1.5 s duplicate join job per call). Exploding both directions
    # is the same multiset into the same distinct.
    #
    # ONE collect of the nation-keyed symmetric edge set (r14, guide
    # §1.1 first-principles + §5): the distinct frame is bounded by the
    # nation KEY DOMAIN (<= 25x24 directed rows at ANY scale factor), so
    # after the one distributed corpus-scale join+distinct the whole
    # peel is O(|edges|) integer counting per round. The previous shape
    # re-filtered and re-aggregated the persisted frame once per round
    # (a collect job of pure scheduling overhead each). The peel below
    # executes the IDENTICAL integer degree counts and >= Q29_K drops,
    # so the result is bit-equal — pinned by the q29 fixpoint test and
    # the kcore_broadcast dual. Web-scale node sets use kcore_broadcast
    # (bit-equal, tested), which keeps every round distributed.
    srows = (
        raw.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("a"), F.col("dst").alias("b")
                    ),
                    F.struct(
                        F.col("dst").alias("a"), F.col("src").alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
        .collect()
    )
    sym = [(int(r.a), int(r.b)) for r in srows]
    alive = sorted({a for a, _ in sym})
    deg: dict[int, int] = {}
    for _ in range(Q29_ROUNDS):
        if not alive:
            deg = {}
            break
        live = set(alive)
        deg = {}
        for a, b in sym:
            if a in live and b in live:
                deg[a] = deg.get(a, 0) + 1
        alive = sorted(n for n in alive if deg.get(n, 0) >= Q29_K)
    if not alive:
        # empty core: the typed empty frame (q26 discipline)
        return spark.createDataFrame([], "nationkey long, core_degree long")
    rows = [(int(n), int(deg[n])) for n in alive]
    return spark.createDataFrame(rows, "nationkey long, core_degree long")


# ---------------------------------------------------------------------------
# t37: interpolated Kneser-Ney bigram scoring (exact cross-engine)
# ---------------------------------------------------------------------------

T37_D = 0.75

_T37_ORACLE = rf"""
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
    c2 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2
        FROM big GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1,
               CAST(COUNT(*) AS BIGINT) AS nf
        FROM c2 GROUP BY w1
    ),
    cb AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb
        FROM c2 GROUP BY w2
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c2),
    scored AS (
        -- interpolated KN over identical integer inputs: the whole
        -- probability is ONE double expression, the nll cut to 9-dp
        -- DECIMAL via VARCHAR (shortest-repr HALF_UP; never
        -- ROUND(double)) so the per-doc sum is order-independent
        SELECT b.doc_id,
               CAST(CAST(-LN(
                   (GREATEST(CAST(c2.n2 AS DOUBLE) - {T37_D}, 0.0)
                    / CAST(c1.n1 AS DOUBLE))
                   + (({T37_D} * CAST(c1.nf AS DOUBLE)
                       / CAST(c1.n1 AS DOUBLE))
                      * (CAST(cb.nb AS DOUBLE) / CAST(tot.nt AS DOUBLE)))
               ) AS VARCHAR) AS DECIMAL(18,9)) AS nll
        FROM big b
        JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        JOIN c1 ON b.w1 = c1.w1
        JOIN cb ON b.w2 = cb.w2
        CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll) AS DOUBLE) AS total_nll,
           CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM scored GROUP BY doc_id
"""


@register(
    "t37_kneser_ney_logprob",
    _T37_ORACLE,
    category="llm-text",
    doc=(
        "interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; "
        "Chen & Goodman 1999 — the LM-based data-selection scorer "
        "beside t10's unigram and t25's add-one bigram): "
        "P(w2|w1) = max(c12-D,0)/c1 + (D*N1+(w1.)/c1) * "
        "(N1+(.w2)/N1+(..)) with D=0.75 — absolute discounting plus "
        "the continuation-probability backoff that makes KN the "
        "standard n-gram smoother. EVERY input is an integer corpus "
        "statistic (bigram count, context total, distinct followers, "
        "distinct predecessors, distinct bigram types), the "
        "probability is ONE double expression over them (identical "
        "IEEE ops both engines — the t35 discipline), each nll cuts "
        "to a 9-dp DECIMAL via the shortest-repr cast, and per-doc "
        "sums ride DECIMAL (order-independent) — strict hash-green. "
        "100 TB: bigram stats are partial-agg-combinable groupBys; "
        "follower/predecessor counts derive from the (already "
        "bounded) bigram-type table; the scoring join is bigram-keyed "
        "with AQE handling the Zipf head (the t06/t10 salted-join "
        "family applies if a probe ever shows a binding hot key)."
    ),
)
def t37_kneser_ney_logprob(spark, sf_dir):
    from ..functions.text import whitespace_tokens

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
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .persist(StorageLevel.DISK_ONLY)
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("n2").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("nf"),
    )
    cb = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    tot = c2.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    p = (
        F.greatest(F.col("n2").cast("double") - T37_D, F.lit(0.0))
        / F.col("n1").cast("double")
    ) + (
        (T37_D * F.col("nf").cast("double") / F.col("n1").cast("double"))
        * (F.col("nb").cast("double") / F.col("nt").cast("double"))
    )
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (-F.log(p)).cast("decimal(18,9)").alias("nll"))
    )
    # janitor lifetime for big (the a16/r8 lineage rule)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll").cast("double").alias("total_nll"),
        (F.sum("nll").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
    )


def kcore_broadcast(spark, edges, k: int = Q29_K, rounds: int = Q29_ROUNDS):
    """q29's web-scale peel (the pagerank_broadcast pattern): the alive
    set lives in a node-sized DataFrame semi-joined onto both edge
    endpoints each round — never a literal IN list, so the node set can
    be millions. Bit-equal to the q29 literal path by construction:
    the same degree-within-survivors aggregation, the same >= k drop,
    the same fixed round count. ``edges``: symmetric (a, b) frame with
    self-loops removed. Returns q29's exact output schema. Per round:
    ONE edge-frame scan (two broadcast semi-joins + a count agg) and a
    node-sized rebuild, localCheckpoint'ed so lineage stays flat; at
    true web scale drop the broadcast hints and AQE picks shuffle
    joins."""
    sym = edges.persist(StorageLevel.DISK_ONLY)
    alive = (
        sym.select(F.col("a").alias("n")).distinct().localCheckpoint(eager=True)
    )
    deg = None
    for _ in range(rounds):
        if alive.rdd.isEmpty():
            deg = None
            break
        deg = (
            sym.join(F.broadcast(alive), sym["a"] == alive["n"])
            .drop("n")
            .join(
                F.broadcast(alive.select(F.col("n").alias("_b"))),
                F.col("b") == F.col("_b"),
            )
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=True)
        )
        alive = (
            deg.filter(F.col("d") >= k)
            .select(F.col("a").alias("n"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist(blocking=False)
    if deg is None:
        return spark.createDataFrame([], "nationkey long, core_degree long")
    return deg.join(F.broadcast(alive), deg["a"] == alive["n"]).select(
        F.col("a").cast("long").alias("nationkey"),
        F.col("d").cast("long").alias("core_degree"),
    )


# ---------------------------------------------------------------------------
# d25: asymmetric containment near-dup audit (near-subset detection)
# ---------------------------------------------------------------------------

D25_CONTAINMENT = 0.8


def _d25_oracle_sql() -> str:
    from .wave13 import _D21_CTE_BODY

    return rf"""
    WITH {_D21_CTE_BODY},
    adm AS (
        SELECT i.id_a, i.id_b, i.ninter, za.n AS na, zb.n AS nb
        FROM inter i
        JOIN sz za ON za.doc_id = i.id_a
        JOIN sz zb ON zb.doc_id = i.id_b
        WHERE GREATEST(CAST(i.ninter AS DOUBLE) / za.n,
                       CAST(i.ninter AS DOUBLE) / zb.n)
              >= {D25_CONTAINMENT}
    )
    SELECT id_a, id_b, CAST(ninter AS BIGINT) AS n_common,
           CAST(CAST(CAST(CAST(ninter AS DOUBLE) / na AS VARCHAR)
                AS DECIMAL(18,6)) AS DOUBLE) AS containment_ab,
           CAST(CAST(CAST(CAST(ninter AS DOUBLE) / nb AS VARCHAR)
                AS DECIMAL(18,6)) AS DOUBLE) AS containment_ba
    FROM adm
    """


@register(
    "d25_containment_audit",
    _d25_oracle_sql(),
    category="llm-dedup",
    doc=(
        "asymmetric Jaccard-CONTAINMENT near-dup detection (Broder's "
        "containment measure |A∩B|/|A| — the near-SUBSET detector "
        "symmetric Jaccard misses: a short document quoted whole "
        "inside a long one scores high containment but low Jaccard, "
        "the boilerplate-wrapper / quote-extraction case every "
        "curation pipeline also needs): the SAME sha-derived candidate "
        "machinery as d21 (shared `_d21_inter_sz` Spark helper and "
        "shared `_D21_CTE_BODY` oracle chain — the two audits cannot "
        "desynchronize), admitting pairs where EITHER direction's "
        "exact distinct-shingle containment reaches "
        f"{D25_CONTAINMENT}. Both directions reported (6-dp decimal "
        "cut of identical integer divisions). Strict hash-green. "
        "100 TB: identical shape to d21 — the band equi-join is the "
        "only corpus shuffle; LSH recall for high-containment "
        "asymmetric pairs is lower than for symmetric ones (the "
        "min-hash collision probability follows Jaccard, not "
        "containment) — the documented trade; a prefix-filtered "
        "containment join (d07's PPJoin family) is the exhaustive "
        "alternative when recall must be total."
    ),
)
def d25_containment_audit(spark, sf_dir):
    from .wave13 import _d21_inter_sz

    inter, sz = _d21_inter_sz(spark, sf_dir)
    c_ab = F.col("ninter").cast("double") / F.col("na")
    c_ba = F.col("ninter").cast("double") / F.col("nb")
    return (
        inter.join(
            sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .filter(F.greatest(c_ab, c_ba) >= D25_CONTAINMENT)
        .select(
            "id_a",
            "id_b",
            F.col("ninter").cast("long").alias("n_common"),
            c_ab.cast("decimal(18,6)").cast("double").alias("containment_ab"),
            c_ba.cast("decimal(18,6)").cast("double").alias("containment_ba"),
        )
    )
