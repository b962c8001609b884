"""Similarity search over embedding columns (SURVEY.md §2.2 extensions).

- Exact top-k: brute-force cosine — broadcast the (small) query set against
  the full corpus; ranking via window row_number, never a driver-side sort.
- ANN: random-hyperplane LSH — deterministic signed projections bucket the
  corpus; candidates are reranked exactly. At 100 TB the bucket join is the
  only shuffle and the hyperplane matrix is a broadcast literal.

Dot products run as JVM ``zip_with``/``aggregate`` expressions over
``array<double>`` — sequential fold, bit-identical to the DuckDB oracle's
``list_dot_product``.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import register
from ..sources import load_table, spread_scan


def to_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def lit_matrix(rows) -> Column:
    """A nested array<double> literal built through ONE parsed SQL
    expression. ``F.lit`` on a nested Python list issues a Py4J call per
    element (~0.8 s to build an 8×64 or 8×16×8 literal — measured), which
    dominated ANN plan construction; ``repr(float)`` is the shortest
    exact round-trip so the parsed literal is bit-identical to the
    ``F.lit`` one (verified EQUAL on gaussian matrices)."""

    def fmt(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(fmt(v) for v in x) + ")"
        v = float(x)
        # nan/inf render as 'nanD'/'infD', which F.expr rejects with an
        # opaque parse error far from the cause (e.g. NaN embeddings
        # propagating into centroids) — fail loud and attributable here.
        if not math.isfinite(v):
            raise ValueError(f"lit_matrix: non-finite matrix element {v!r}")
        return repr(v) + "D"

    return F.expr(fmt(rows))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rn<=k).

    queries is expected to be small → broadcast; corpus streams through.
    Ranking on (rounded cosine desc, neighbor id) is fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    sim = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        # project the vectors away BEFORE the ranking shuffle — only
        # (ids, cosine) travel to the window stage (~16× narrower rows)
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 10,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    bucketer: str = "numpy",
) -> DataFrame:
    """ANN top-k: multi-table random-hyperplane LSH + exact rerank.

    Each of the L tables buckets vectors by the sign pattern of n_planes
    projections; a (query, candidate) pair is considered if it collides
    in ANY table (explode L bucket structs → equi-join on (table, bucket)
    → distinct). Recall ≈ 1-(1-p^n_planes)^L; candidates shrink
    ~2^-n_planes per table, so the bucket join — the only shuffle —
    touches a small fraction of the corpus per query. Tested against
    exact_topk for recall.

    ``multiprobe`` (Lv et al. 2007, public): each query ALSO probes the
    n_planes buckets at Hamming distance 1 from its own code in every
    table — the buckets a near neighbor most likely fell into when one
    projection's sign flipped. Probe expansion happens on the QUERY side
    only (the broadcast side: ×(n_planes+1) rows on a handful of query
    vectors), the corpus index is untouched, and candidates grow by at
    most the same factor while recall rises steeply — measured 0.22 →
    ≥0.6 recall@5 on the near-unclusterable gaussian test corpus
    (APPROX_CHECKS). This is the standard lever when more tables are
    too expensive: probes are free, tables cost index memory.
    """
    # All L tables' signed projections in ONE Arrow-vectorized pandas UDF:
    # each batch is a (rows × dim) @ (dim × L·n_planes) BLAS matmul, then
    # sign bits fold to L bucket ids per row. Dense linear algebra is the
    # one hot path where JVM expressions lose: a higher-order
    # transform/aggregate over an (L × n_planes × dim) literal is
    # interpreted per element (~2 s/5k rows at L=8, n_planes=6, dim=64,
    # plus ~2 s of py4j literal construction per call), while the matmul
    # is microseconds — and the gap widens linearly with corpus size.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    all_planes = [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    # (dim, L*n_planes), column-major by table
    plane_mat = np.array(all_planes, dtype=np.float64).reshape(
        n_tables * n_planes, dim
    ).T.copy()
    pows = 2 ** np.arange(n_planes - 1, -1, -1, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def bucket_ids_udf(vs):  # pd.Series of list[float] -> pd.Series of list[int]
        mat = np.array(vs.tolist(), dtype=np.float64)  # (rows, dim)
        bits = (mat @ plane_mat) > 0  # (rows, L*n_planes)
        ids = bits.reshape(len(vs), n_tables, n_planes).astype(np.int64) @ pows
        return pd.Series(list(ids))

    def bucket_ids_fold(vc):
        """``bucketer='fold'``: the same L bucket ids as JVM-side
        sequential folds — dot(v, plane) is a left-to-right
        zip_with/aggregate, BIT-IDENTICAL to DuckDB's
        ``list_dot_product`` loop (verified over 96k projections), so
        an oracle carrying the plane literals reproduces every sign and
        hence every bucket. Interpreted higher-order exprs are the LSH
        slow path (the numpy matmul above is the production bucketer);
        this one exists so the candidate pipeline is auditable
        hash-exact (v14).

        The whole L·n_planes fold runs as ONE parsed SQL expression over
        ONE nested (L·n_planes)×dim plane literal: composing it
        Column-by-Column issued hundreds of py4j calls (r12 profile:
        3.9 s plan build vs 2.1 s execute at sf0.1), and even as one
        string, 96 separate plane-literal subtrees kept Catalyst
        analysis/codegen on the critical path — the lit_matrix lesson
        applied to the expression TREE, not just the literals. Each
        per-plane dot is the same left-to-right zip_with/aggregate
        fold, and the bit packing is exact integer arithmetic, so
        results are bit-unchanged (pinned by the fold==numpy pytest +
        the oracle hash check)."""
        flat = [all_planes[t][i] for t in range(n_tables) for i in range(n_planes)]
        mat = (
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in p) + ")"
                for p in flat
            )
            + ")"
        )
        np_, top = n_planes, n_planes - 1
        return F.expr(
            f"transform(sequence(0, {n_tables - 1}), t -> "
            f"aggregate(sequence(0, {np_ - 1}), CAST(0 AS BIGINT), (acc, i) -> "
            f"acc + CAST(aggregate(zip_with({vec_col}, "
            f"element_at({mat}, CAST(t * {np_} + i + 1 AS INT)), "
            f"(x, y) -> x * y), 0.0D, (a2, x2) -> a2 + x2) > 0.0D AS BIGINT) "
            f"* shiftleft(CAST(1 AS BIGINT), CAST({top} - i AS INT))))"
        )

    bucket_ids = (
        bucket_ids_fold if bucketer == "fold" else bucket_ids_udf
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        bucket_ids(F.col(vec_col)).alias("_bkts"),
    ).select(
        "query_id", "qv", F.posexplode("_bkts").alias("tbl", "bkt")
    )
    if multiprobe:
        # the query's own code plus its n_planes one-bit flips, JVM-side
        q = q.select(
            "query_id",
            "qv",
            "tbl",
            F.explode(
                F.array(
                    F.col("bkt"),
                    *[
                        F.col("bkt").bitwiseXOR(F.lit(1 << i)).cast("bigint")
                        for i in range(n_planes)
                    ],
                )
            ).alias("bkt"),
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        bucket_ids(F.col(vec_col)).alias("_bkts"),
    ).select(
        "neighbor_id", "cv", F.posexplode("_bkts").alias("tbl", "bkt")
    )
    sim = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
    # dedupe multi-table collisions AFTER scoring (cosine is identical per
    # pair, max() collapses) — avoids a distinct() over vector columns
    scored = (
        F.broadcast(q)
        .join(c, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_cos", sim)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("_cos").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def l2sq(a: Column, b: Column) -> Column:
    # one zip_with (squared diff fused into the lambda), one fold — the
    # earlier dot(d, d) form duplicated the zip_with sub-tree twice
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _collect_train_sample(
    corpus: DataFrame, id_col: str, vec_col: str, n: int
) -> list[list[float]]:
    """Deterministic bounded training set, collected: the ``n`` vectors
    ranked first by sha256(id) — the same deterministic-shuffle ranking
    the quantizer inits use, extended to the whole training input
    (FAISS-style practice trains k-means/PQ on a ~10⁵–10⁶ vector sample,
    never the full corpus). Top-n by sort is per-partition top-n + merge
    (TakeOrdered) — ONE distributed job over the corpus; the result is
    model-training state bounded by the caller's ``n`` regardless of
    corpus size (n × dim float64 — 100k × 64 ≈ 51 MB), returned in rank
    order so every downstream summation has a fixed, deterministic
    order."""
    rows = (
        corpus.select(
            F.sha2(F.col(id_col).cast("string"), 256).alias("_h"),
            F.col(id_col).alias("_id"),
            to_double_array(F.col(vec_col)).alias("_v"),
        )
        .orderBy("_h", "_id")
        .limit(n)
        .collect()
    )
    return [r["_v"] for r in rows]


def _np_assign(X, C, budget_floats: int = 4_000_000):
    """Blocked nearest-centroid assignment: argmin over the expanded
    ||x||² − 2x·c + ||c||² distance matrix, computed in row blocks so the
    n×k scratch stays ~32 MB whatever k is. np.argmin breaks ties on the
    first minimal index — the same tie-break as the JVM path's
    array_position(array_min)."""
    import numpy as np

    out = np.empty(len(X), dtype=np.int64)
    c2 = (C * C).sum(axis=1)[None, :]
    block = max(256, budget_floats // max(1, len(C)))
    for s in range(0, len(X), block):
        xb = X[s : s + block]
        d = (xb * xb).sum(axis=1)[:, None] - 2.0 * (xb @ C.T) + c2
        out[s : s + block] = d.argmin(axis=1)
    return out


def _numpy_lloyd(vecs: list[list[float]], k: int, iters: int) -> list[list[float]]:
    """Driver-side Lloyd over the collected bounded sample. Init = the
    first ``k`` vectors of the sha-rank-ordered sample (identical to the
    distributed path's TakeOrdered init). Deterministic: sample content
    and order are sha-fixed, numpy reductions run in that fixed order,
    argmin ties take the first index. Empty clusters keep their previous
    centroid, matching the distributed step."""
    import numpy as np

    X = np.asarray(vecs, dtype=np.float64)
    C = X[:k].copy()
    for _ in range(iters):
        cid = _np_assign(X, C)
        for c in range(len(C)):
            m = cid == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return [[float(x) for x in row] for row in C]


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    dim: int,
    iters: int = 2,
    train_sample_size: int | None = 100_000,
) -> list[list[float]]:
    """Deterministic Lloyd k-means, DataFrame-native.

    Init = the ``n_clusters`` vectors ranked first by sha256(id) (a
    deterministic shuffle, no rand()).

    With ``train_sample_size`` set (the default, FAISS practice:
    quantizers train on a bounded ~10⁵–10⁶ vector sample, never the full
    corpus), ONE distributed TakeOrdered job collects the sha-ranked
    sample and the Lloyd loop runs driver-side in numpy — no
    per-iteration cluster jobs at all, and the driver footprint is
    bounded by the caller's sample size (n × dim float64), not the
    corpus. Deterministic: sample content/order are sha-fixed and the
    numpy reductions run in that order.

    With ``train_sample_size=None`` the full corpus trains distributed:
    each iteration assigns points to the nearest centroid (argmin over
    broadcast literals) and re-averages per dimension through DECIMAL
    sums — order-independent, bit-stable across runs and parallelism.
    Either way the model state is k×dim floats driver-side (like any
    trained-model broadcast) and encoding/assignment of the full corpus
    stays with the caller.
    """
    if train_sample_size is not None:
        vecs = _collect_train_sample(corpus, id_col, vec_col, train_sample_size)
        return _numpy_lloyd(vecs, n_clusters, iters)
    train = corpus.select(
        F.sha2(F.col(id_col).cast("string"), 256).alias("_h"),
        F.col(id_col),
        F.col(vec_col),
    )
    # deterministic shuffle-order init via TakeOrderedAndProject
    # (top-k by sha256(id))
    init = train.orderBy("_h", id_col).limit(n_clusters).collect()
    cents = [list(map(float, r[vec_col])) for r in init]
    for _ in range(iters):
        cents = _lloyd_step(train, vec_col, cents, dim)
    return cents


def _lloyd_step(
    train: DataFrame, vec_col: str, cents: list[list[float]], dim: int
) -> list[list[float]]:
    # re-average per (cluster, dimension) via posexplode: tiny
    # expression tree, map-side partial aggregation, k×dim result rows.
    # The argmin MUST be projected in its own step before the
    # generator: a single select(argmin, posexplode(v)) makes Spark
    # re-evaluate the k×dim argmin expression once per exploded
    # element (dim× redundant work — measured 5× slower at k=8,
    # dim=64); the two-step projection evaluates it once per row.
    assigned = train.select(
        nearest_centroid(F.col(vec_col), cents).alias("_cid"), vec_col
    ).select(
        "_cid", F.posexplode(to_double_array(F.col(vec_col))).alias("_pos", "_x")
    )
    sums = assigned.groupBy("_cid", "_pos").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("_x").cast("decimal(28,10)")).alias("_s"),
    )
    acc: dict[int, list[float]] = {}
    for r in sums.collect():
        acc.setdefault(r["_cid"], [0.0] * dim)[r["_pos"]] = float(r["_s"]) / r["_n"]
    # (empty cluster keeps its previous centroid)
    return [acc.get(c, cents[c]) for c in range(len(cents))]


def nearest_centroid(vec: Column, cents: list[list[float]]) -> Column:
    """argmin_c ||vec - cent_c||² over a single nested-array literal.

    The centroid matrix is ONE constant-folded literal node; distances are
    a transform over it — not per-centroid literal-array sub-trees, which
    made Catalyst time quadratic in k×dim."""
    dists = F.transform(lit_matrix(cents), lambda c: l2sq(vec, c))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def nearest_centroids(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """The nprobe nearest centroid ids (array), for query-side probing."""
    scored = F.transform(
        lit_matrix(cents),
        lambda c, i: F.struct(l2sq(vec, c).alias("d"), i.cast("int").alias("cid")),
    )
    return F.slice(F.array_sort(scored), 1, nprobe).getField("cid")


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    iters: int = 2,
    train_sample_size: int | None = 100_000,
) -> DataFrame:
    """IVF (cluster-then-probe) ANN: k-means partitions the corpus; each
    query probes its ``nprobe`` nearest centroids and reranks the probed
    cells exactly. Same join shape as the LSH path (equi-join on a cell
    id) — SCALE.md's promised IVF drop-in. The scan fraction is
    ~nprobe/n_clusters of the corpus per query; centroids are broadcast
    literals, so the cell join is the only shuffle.

    The corpus is persisted (memory-with-disk-spill) across the eager
    phases that each re-scan it — the training-sample TakeOrdered job
    plus the encode/search scans of the returned plan — and released by
    the caller's lifecycle. At cluster scale the same pattern holds:
    cache what multiple phases re-read, unpersist when done."""
    corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents = kmeans_centroids(
            corpus, id_col, vec_col, n_clusters, dim, iters,
            train_sample_size=train_sample_size,
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            nearest_centroid(F.col(vec_col), cents).alias("cid"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(nearest_centroids(F.col(vec_col), cents, nprobe)).alias("cid"),
        )
        sim = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
        w = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        scored = (
            F.broadcast(q)
            .join(c, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", sim.alias("cosine"))
        )
        out = (
            scored.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cosine", "rn")
        )
        # materialize while the cache is hot: the result is ≤ |queries|·k
        # rows of scalars, so localCheckpoint is model-output-scale, and it
        # lets the cache be dropped before returning the (now source-free)
        # plan instead of leaking the persist to the caller.
        return out.localCheckpoint(eager=True)
    finally:
        corpus.unpersist(blocking=False)


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


@register(
    "v01_exact_cosine_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv, e.v)
                     / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
                 AS cosine
        FROM q JOIN e ON q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored)
    WHERE rn <= 5
    """,
    category="llm-similarity",
    doc="exact brute-force cosine top-5 for 20 probe vectors (broadcast × corpus).",
)
def v01_exact_cosine_topk(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    return exact_topk(e, q, "vec_id", "v", k=5)


@register(
    "v02_ann_lsh_topk",
    None,  # approximate by construction — recall vs v01 is tested in pytest
    category="llm-similarity",
    doc="ANN top-5 via multi-table random-hyperplane LSH (6 planes × 8 tables, seed=42, Hamming-1 multiprobe on the query side) + exact rerank.",
)
def v02_ann_lsh_topk(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    return ann_topk_lsh(e, q, "vec_id", "v", k=5, n_planes=6, n_tables=8, dim=64, seed=42)


#: v14 audits a deterministic sha-ranked QUARTER of the corpus (hex
#: first-char '0'-'3'): the audit's cost is O(corpus × tables × planes)
#: interpreted folds — the price of bit-exactness — and the machinery
#: is identical at any corpus fraction, so the audit transfers while
#: the wave11 suite budget stays bounded (VERDICT r11 item 7). The
#: filter is the sha-prefix discipline the ANN training sampler already
#: uses (kmeans_centroids) and DuckDB replays it exactly.
V14_SHA_PREFIX_MAX = "3"


def v14_corpus(e):
    """The sha-restricted audit corpus (shared by query, oracle, tests)."""
    return e.filter(
        F.substring(F.sha2(F.col("vec_id").cast("string"), 256), 1, 1)
        <= V14_SHA_PREFIX_MAX
    )


def _v14_oracle_sql(
    n_planes: int = 6, n_tables: int = 8, dim: int = 64, seed: int = 42,
    k: int = 5,
) -> str:
    """DuckDB replay of the COMPLETE LSH candidate pipeline: the
    seeded hyperplanes enter as literals (the k-means-oracle
    discipline), bucket ids are the same sign-folded codes
    (``list_dot_product`` is bit-identical to the JVM fold — verified
    over 96k projections), multiprobe XORs the same one-bit flips, and
    the candidate set reranks exactly. v02's candidate generation is
    thereby oracle-audited hash-exact (r10 verdict item 5)."""
    planes = []
    for t in range(n_tables):
        for i, p in enumerate(hyperplanes(dim, n_planes, seed + 1000 * t)):
            vec = ",".join(repr(float(x)) for x in p)
            planes.append(f"({t}, {i}, [{vec}])")
    flips = ", ".join(
        ["0"] + [str(1 << i) for i in range(n_planes)]
    )
    return f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    sub AS MATERIALIZED (
        SELECT * FROM e
        WHERE substr(sha256(CAST(vec_id AS VARCHAR)), 1, 1) <= '{V14_SHA_PREFIX_MAX}'
    ),
    planes(tbl, pidx, p) AS (VALUES {",".join(planes)}),
    cb AS MATERIALIZED (
        SELECT e.vec_id, pl.tbl,
               CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) > 0
                    THEN 1 << ({n_planes - 1} - pl.pidx)
                    ELSE 0 END) AS BIGINT) AS bkt
        FROM sub e, planes pl GROUP BY e.vec_id, pl.tbl
    ),
    qcb AS (
        SELECT e.vec_id, pl.tbl,
               CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) > 0
                    THEN 1 << ({n_planes - 1} - pl.pidx)
                    ELSE 0 END) AS BIGINT) AS bkt
        FROM e, planes pl WHERE e.vec_id < 20 GROUP BY e.vec_id, pl.tbl
    ),
    qb AS (
        SELECT qcb.vec_id AS query_id, qcb.tbl,
               xor(qcb.bkt, CAST(t.f AS BIGINT)) AS bkt
        FROM qcb, UNNEST([{flips}]) AS t(f)
    ),
    cand AS (
        SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        FROM qb q JOIN cb c ON c.tbl = q.tbl AND c.bkt = q.bkt
        WHERE c.vec_id <> q.query_id
    ),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               ROUND(list_dot_product(q.v, c.v)
                     / (sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        FROM cand
        JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored)
    WHERE rn <= {k}
    """


@register(
    "v14_lsh_candidate_audit",
    _v14_oracle_sql(),
    category="llm-similarity",
    doc=(
        "oracle-audited twin of v02: the IDENTICAL multi-table "
        "hyperplane LSH candidate pipeline (same seeded planes, same "
        "6-bit codes, same Hamming-1 multiprobe, same bucket join and "
        "exact rerank) with projections computed as JVM sequential "
        "folds — bit-identical to DuckDB's list_dot_product, so the "
        "oracle carrying the plane literals replays every bucket id "
        "and the result HASH-MATCHES. The audited corpus side is a "
        "deterministic sha-prefix QUARTER of the table (the interpreted "
        "folds are the audit's price; the machinery is fraction-"
        "invariant and the oracle applies the same filter — r11 item "
        "7's cost bound). v02 keeps the Arrow/numpy bucketer for "
        "production throughput; a pytest pins the two bucketers EQUAL "
        "row-for-row on the same corpus, closing the loop: the "
        "rows-only ANN family's candidate machinery is covered by a "
        "strict hash-green driver row (r10 verdict item 5)."
    ),
)
def v14_lsh_candidate_audit(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    return ann_topk_lsh(
        v14_corpus(e), q, "vec_id", "v", k=5, n_planes=6, n_tables=8,
        dim=64, seed=42, bucketer="fold",
    )


@register(
    "v04_ann_ivf_topk",
    None,  # approximate by construction — recall vs v01 is tested in pytest
    category="llm-similarity",
    doc=(
        "IVF ANN top-5 (deterministic k-means cells, nprobe=6 of 8, 2 Lloyd "
        "iterations) + exact rerank. The synthetic gaussian corpus is "
        "near-unclusterable, so the probe fraction is tuned high to hold "
        "recall (r8 A/B: nprobe 5→6 + iters 1→2 lifted recall@5 0.74→0.91 "
        "at equal runtime); on naturally clustered embeddings the same "
        "shape runs at nprobe/n_clusters ≪ 1 — the recall pytest and the "
        "per-round APPROX_CHECKS trend pin the contract."
    ),
)
def v04_ann_ivf_topk(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    return ann_topk_ivf(e, q, "vec_id", "v", k=5, n_clusters=8, nprobe=6, dim=64, iters=2)


@register(
    "v05_embedding_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127 AS scale
          FROM e),
    err AS (SELECT vec_id, scale,
                   list_transform(list_zip(v, list_transform(v, x -> round(x / scale) * scale)),
                                  p -> p[1] - p[2]) AS e
            FROM s WHERE scale > 0)
    SELECT vec_id, ROUND(scale, 6) AS scale,
           ROUND(sqrt(list_dot_product(e, e) / 64), 6) AS rmse
    FROM err
    """,
    category="llm-similarity",
    doc=(
        "int8 symmetric quantization accounting: per-vector scale = "
        "max|x|/127 and dequantization RMSE — the compression/recall "
        "trade audit a 100 TB vector store runs before switching ANN to "
        "quantized codes. Pure array expressions; the sequential-fold "
        "dot product matches DuckDB's list_dot_product bit-for-bit."
    ),
)
def v05_embedding_quantize(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    scale = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / 127
    s = e.select("vec_id", "v", scale.alias("scale")).filter(F.col("scale") > 0)
    dequant = F.transform(
        F.col("v"), lambda x: F.round(x / F.col("scale")) * F.col("scale")
    )
    err = F.zip_with(F.col("v"), dequant, lambda a, b: a - b)
    s = s.select("vec_id", "scale", err.alias("e"))
    return s.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(F.sqrt(dot(F.col("e"), F.col("e")) / 64), 6).alias("rmse"),
    )


@register(
    "v03_embedding_stats",
    """
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(ROUND(sqrt(list_dot_product(v, v)), 6)) AS DOUBLE) / COUNT(*), 6)
             AS avg_norm,
           ROUND(MIN(sqrt(list_dot_product(v, v))), 6) AS min_norm,
           ROUND(MAX(sqrt(list_dot_product(v, v))), 6) AS max_norm
    FROM e
    GROUP BY label
    """,
    category="llm-similarity",
    doc="per-label embedding norm stats (vector column aggregation).",
)
def v03_embedding_stats(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", to_double_array("embedding").alias("v")
    )
    nrm = norm(F.col("v"))
    return (
        e.withColumn("nrm6", F.round(nrm, 6))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("nrm6") / F.count("*"), 6).alias("avg_norm"),
            F.round(F.min(nrm), 6).alias("min_norm"),
            F.round(F.max(nrm), 6).alias("max_norm"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_clusters: int = 8,
    dim: int = 64,
    iters: int = 1,
    threshold: float = 0.97,
    train_sample_size: int | None = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public paper):
    cluster the embedding space with deterministic k-means, then WITHIN
    each cluster drop every vector that has a near-duplicate
    (cosine >= threshold) with a smaller id. Returns
    (id, cluster_id, keep) for every input row.

    Scale shape: the all-pairs comparison is confined to clusters — one
    shuffle on cluster id, then a per-cluster Arrow-batched BLAS matmul
    (O(sum of cluster sizes squared), the published algorithm's cost),
    never a global cross join; the dropped set is a semi-join back onto
    the corpus. Dense pairwise cosine is the hot path where JVM
    higher-order expressions lose (interpreted per element, and they
    recompute both norms per PAIR); the grouped matmul normalizes each
    vector once and does the n_c × n_c similarity block in microseconds.
    A cluster must fit one Arrow batch — that is SemDeDup's own
    constraint (cluster size ≈ N/k; pick k accordingly, or chunk the
    matmul inside the group for pathological clusters).
    """
    import numpy as np
    import pandas as pd

    corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents = kmeans_centroids(
            corpus, id_col, vec_col, n_clusters, dim, iters,
            train_sample_size=train_sample_size,
        )
        assigned = corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            nearest_centroid(F.col(vec_col), cents).alias("cluster_id"),
        )

        def _dropped_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) < 2:
                return pdf.iloc[0:0][["_id"]]
            pdf = pdf.sort_values("_id")
            mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0.0] = 1.0
            u = mat / nrm[:, None]
            # [i, j] (i<j): row j has a near-dup with a smaller id
            hit = np.triu(u @ u.T >= threshold, k=1).any(axis=0)
            return pdf.loc[hit, ["_id"]]

        dropped = assigned.groupBy("cluster_id").applyInPandas(
            _dropped_in_cluster, "_id bigint"
        )
        out = (
            assigned.join(dropped.withColumn("_dropped", F.lit(1)), "_id", "left")
            .select(
                F.col("_id").alias(id_col),
                "cluster_id",
                F.when(F.col("_dropped").isNull(), 1).otherwise(0).alias("keep"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        corpus.unpersist(blocking=False)


@register(
    "d11_semantic_dedup",
    None,  # k-means cluster assignment is not SQL-expressible; property-tested
    category="llm-dedup",
    doc=(
        "SemDeDup-style semantic dedup: deterministic k-means clusters the "
        "embedding space, near-duplicates (cosine >= 0.97) are dropped "
        "within clusters keeping the smallest id. Pairwise work confined "
        "to clusters (equi-join on cluster id); property tests pin the "
        "keep-set invariants."
    ),
)
def d11_semantic_dedup(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    return semantic_dedup(e, "vec_id", "v", n_clusters=8, dim=64, iters=1)


@register(
    "v06_cosine_range_search",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20)
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv, e.v)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
        FROM q JOIN e ON q.query_id <> e.vec_id
    ) WHERE cosine >= 0.3
    """,
    category="llm-similarity",
    doc=(
        "cosine range (radius) search: ALL corpus neighbors with "
        "similarity >= 0.3 for each probe — the retrieval mode top-k "
        "can't emulate when the answer-set size is unknown (dedup "
        "candidates, recall-oriented retrieval). Same scale shape as "
        "v01: probes broadcast, corpus streamed once, the threshold "
        "filter runs in the scan stage so only qualifying pairs "
        "materialize; LSH/IVF bucketing (v02/v04) is the same-shaped "
        "approximate accelerator when the corpus outgrows brute force."
    ),
)
def v06_cosine_range_search(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    cos = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
) -> DataFrame:
    """Exact maximum-inner-product top-k: (query_id, neighbor_id, dot,
    rn<=k). Same broadcast-probe/streamed-corpus shape as exact_topk but
    ranked by the raw dot product — the retrieval mode for embeddings
    whose norm carries signal (e.g. unnormalized two-tower scores).
    Vectors are projected away before the ranking shuffle; at scale this
    is one broadcast, one narrow window. The classic MIPS-to-cosine
    norm-augmentation reduction then makes v02/v04's bucketed ANN paths
    applicable unchanged when brute force outgrows the corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    score = F.round(dot(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("dot"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dot", "rn")
    )


@register(
    "v07_mips_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv, e.v), 6) AS dot
        FROM q JOIN e ON q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, dot, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored)
    WHERE rn <= 5
    """,
    category="llm-similarity",
    doc=(
        "exact maximum-inner-product top-5 for 20 probe vectors — "
        "dot-ranked variant of v01 for unnormalized embeddings; same "
        "broadcast x corpus scan, vectors dropped before the window."
    ),
)
def v07_mips_topk(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    return mips_topk(e, q, "vec_id", "v", k=5)


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    train_sample_size: int | None = 100_000,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space splits into
    ``n_sub`` contiguous subspaces, each with its own ``n_codes``-word
    deterministic k-means codebook. ALL subspaces train together — one
    posexplode job per Lloyd iteration, not n_sub separate k-means runs
    (the naive loop cost 8x the scans; measured 12.6 s -> ~3 s at
    sf0.01). Init = the n_codes sha-ranked vectors' slices (shared
    across subspaces — deterministic, no rand()); updates re-average
    through rounded-DECIMAL sums per (subspace, code, dimension), so the
    codebooks are bit-stable across partitionings. Model state is
    n_sub x n_codes x (dim/n_sub) floats, driver-side like any trained
    quantizer; the corpus never leaves executors.

    Like ``kmeans_centroids``, training with ``train_sample_size`` set
    (the default) collects the deterministic sha-ranked sample in ONE
    TakeOrdered job and runs the per-subspace Lloyd loops driver-side in
    numpy — subspace assignments depend only on that subspace's own
    codebook, so sequential per-subspace training is exactly the joint
    update. ``train_sample_size=None`` keeps the distributed
    all-subspaces-together DECIMAL path. Encoding the full corpus with
    the trained books stays with the caller."""
    sub_dim = dim // n_sub

    def slices(vec):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda m: F.slice(vec, m * sub_dim + 1, sub_dim),
        )

    if train_sample_size is not None:
        vecs = _collect_train_sample(corpus, id_col, vec_col, train_sample_size)
        return _numpy_pq(vecs, n_sub, sub_dim, n_codes, iters)
    train = corpus.select(
        F.sha2(F.col(id_col).cast("string"), 256).alias("_h"),
        F.col(id_col),
        F.col(vec_col),
    )
    init = train.orderBy("_h", id_col).limit(n_codes).collect()
    books = [
        [
            [float(x) for x in r[vec_col][m * sub_dim : (m + 1) * sub_dim]]
            for r in init
        ]
        for m in range(n_sub)
    ]
    subs = train.select(slices(F.col(vec_col)).alias("_subs"))
    for _ in range(iters):
        books = _pq_lloyd_step(subs, books)
    return books


def _numpy_pq(
    vecs: list[list[float]], n_sub: int, sub_dim: int, n_codes: int, iters: int
) -> list[list[list[float]]]:
    """Driver-side PQ Lloyd over the collected bounded sample. Init =
    the first ``n_codes`` sample vectors' slices (shared across
    subspaces, matching the distributed init); empty codes keep their
    previous word. Deterministic for the same reasons as
    ``_numpy_lloyd``."""
    import numpy as np

    X = np.asarray(vecs, dtype=np.float64)
    books = []
    for m in range(n_sub):
        Xm = np.ascontiguousarray(X[:, m * sub_dim : (m + 1) * sub_dim])
        B = Xm[:n_codes].copy()
        for _ in range(iters):
            cid = _np_assign(Xm, B)
            for c in range(len(B)):
                msk = cid == c
                if msk.any():
                    B[c] = Xm[msk].mean(axis=0)
        books.append([[float(x) for x in row] for row in B])
    return books


def _pq_lloyd_step(
    subs: DataFrame, books: list[list[list[float]]]
) -> list[list[list[float]]]:
    lit_books = lit_matrix(books)  # one nested [m][k][d] literal node
    # (m, sv) rows; argmin projected BEFORE the dimension explode so
    # the k x sub_dim distance tree evaluates once per subvector
    assigned = (
        subs.select(F.posexplode("_subs").alias("_m", "_sv"))
        .select(
            "_m",
            F.col("_sv"),
            _pq_argmin(F.col("_sv"), F.col("_m"), lit_books).alias("_cid"),
        )
        .select("_m", "_cid", F.posexplode(F.col("_sv")).alias("_pos", "_x"))
    )
    rows = (
        assigned.groupBy("_m", "_cid", "_pos")
        .agg(
            (F.sum(F.round(F.col("_x"), 9).cast("decimal(28,9)")) / F.count("*"))
            .cast("double")
            .alias("_mean")
        )
        .collect()
    )
    new_books = [
        [list(code) for code in book] for book in books
    ]  # keep empty-cluster codes in place
    for r in rows:
        new_books[r["_m"]][r["_cid"]][r["_pos"]] = float(r["_mean"])
    return new_books


def _pq_argmin(sv: Column, m: Column, lit_books: Column) -> Column:
    """argmin over the m-th codebook of a nested [m][k][d] literal."""
    dists = F.transform(
        F.element_at(lit_books, m + 1), lambda c: l2sq(sv, c)
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


@register(
    "v08_pq_quantization_audit",
    None,  # k-means codebooks are not SQL-expressible; rows-only by design,
    # with determinism + reconstruction-error bounds pinned in pytest
    category="llm-similarity",
    doc=(
        "product-quantization audit: 64-dim embeddings -> 8 subspaces x "
        "16-code deterministic k-means codebooks (4 bits/subspace, 8 "
        "bytes/vector vs 256 — 32x compression); per-subspace RMSE of "
        "nearest-codeword reconstruction, the number that decides "
        "whether PQ codes can replace raw vectors in the IVF rerank "
        "(v04). Encoding is an argmin over ONE codebook literal per "
        "subspace, map-side; per-row errors round to 9 dp and sum as "
        "DECIMAL so the audit is bit-stable across partitionings."
    ),
)
def v08_pq_quantization_audit(spark, sf_dir):
    n_sub, sub_dim = 8, 8
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    # the projection is scanned by init, every Lloyd iteration, and the
    # final RMSE pass — persist for the duration (the v04 lesson)
    e = e.persist()
    books = pq_codebooks(e, "vec_id", "v", dim=64, n_sub=n_sub, n_codes=16)
    lit_books = lit_matrix(books)
    subs = e.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                lambda m: F.slice(F.col("v"), m * sub_dim + 1, sub_dim),
            )
        ).alias("_m", "_sv")
    )
    best = F.array_min(
        F.transform(
            F.element_at(lit_books, F.col("_m") + 1), lambda c: l2sq(F.col("_sv"), c)
        )
    )
    return (
        subs.select("_m", F.round(best, 9).cast("decimal(28,9)").alias("_e"))
        .groupBy(F.col("_m").cast("int").alias("subspace"))
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(
                F.sqrt(F.sum("_e").cast("double") / F.count("*") / sub_dim), 6
            ).alias("rmse"),
        )
    )


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 4,
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 1,
    refine: int = 48,
    train_sample_size: int | None = 100_000,
) -> DataFrame:
    """IVF+PQ search with asymmetric distance (the FAISS IVFPQ shape,
    composed from this module's coarse quantizer and ``pq_codebooks``):

    1. k-means coarse cells (deterministic, v04's quantizer);
    2. PQ codebooks trained on CELL RESIDUALS (v - centroid) — residual
       energy is what's left for PQ to encode, the standard IVF-PQ
       refinement over encoding raw vectors;
    3. the corpus is ENCODED: (neighbor_id, cid, codes array<int>) —
       n_sub bytes per vector instead of 8·dim. This is the 100 TB
       memory story: the search structure for a billion 64-dim vectors
       is ~8 GB of codes instead of ~512 GB of floats, so whole shards
       stay executor-resident;
    4. query side builds ONE asymmetric lookup table per (query, probed
       cell): lut[m][j] = ||q_res_sub_m - codebook[m][j]||². ADC distance
       per corpus point is then n_sub ARRAY LOOKUPS (sum of
       lut[m][code_m]) — no per-pair float math, which is the entire
       point of PQ: candidate scan cost is decoupled from ``dim``;
    5. the ``refine`` best ADC candidates per query join back to raw
       vectors for an exact-cosine rerank (classic refine stage) —
       recall is restored from PQ's lossy ranking while exact math runs
       on refine·|queries| rows only.

    The cell equi-join on cid is the only shuffle (query side broadcast,
    one row per (query, probed cell) carrying the LUT). Encoding and
    LUTs are JVM array expressions over literal model state.
    """
    corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    resid = None
    try:
        cents = kmeans_centroids(
            corpus, id_col, vec_col, n_clusters, dim, iters,
            train_sample_size=train_sample_size,
        )
        lit_cents = lit_matrix(cents)
        sub_dim = dim // n_sub
        resid = (
            corpus.select(
                F.col(id_col),
                to_double_array(F.col(vec_col)).alias("_v"),
                nearest_centroid(F.col(vec_col), cents).alias("cid"),
            )
            .select(
                id_col,
                "cid",
                F.zip_with(
                    F.col("_v"),
                    F.element_at(lit_cents, F.col("cid") + 1),
                    lambda x, c: x - c,
                ).alias("_res"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        books = pq_codebooks(
            resid, id_col, "_res", dim=dim, n_sub=n_sub, n_codes=n_codes,
            iters=iters, train_sample_size=train_sample_size,
        )
        lit_books = lit_matrix(books)
        subs = F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda m: F.slice(F.col("_res"), m * sub_dim + 1, sub_dim),
        )
        codes = F.transform(
            subs, lambda sv, m: _pq_argmin(sv, m, lit_books)
        )
        encoded = resid.select(
            F.col(id_col).alias("neighbor_id"), "cid", codes.alias("codes")
        )
        # query side: one row per (query, probed cell) carrying the ADC
        # lookup table for that cell's residual space
        qbase = queries.select(
            F.col(id_col).alias("query_id"),
            to_double_array(F.col(vec_col)).alias("qv"),
            F.explode(
                nearest_centroids(F.col(vec_col), cents, nprobe)
            ).alias("cid"),
        )
        qres = F.zip_with(
            F.col("qv"), F.element_at(lit_cents, F.col("cid") + 1), lambda x, c: x - c
        )
        lut = F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda m: F.transform(
                F.element_at(lit_books, m + 1),
                lambda c: l2sq(F.slice(F.col("_qres"), m * sub_dim + 1, sub_dim), c),
            ),
        )
        qlut = qbase.withColumn("_qres", qres).select(
            "query_id", "qv", "cid", lut.alias("lut")
        )
        adc = F.aggregate(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(
                F.element_at(F.col("lut"), m + 1),
                F.element_at(F.col("codes"), m + 1) + 1,
            ),
        )
        w1 = W.partitionBy("query_id").orderBy(
            F.col("adc").asc(), F.col("neighbor_id").asc()
        )
        short = (
            F.broadcast(qlut)
            .join(encoded, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "qv", "neighbor_id", adc.alias("adc"))
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= refine)
            .select("query_id", "qv", "neighbor_id")
        )
        raw = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(F.col(vec_col)).alias("nv"),
        )
        w2 = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        out = (
            short.join(raw, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(cosine_sim(F.col("qv"), F.col("nv")), 6).alias("cosine"),
            )
            .withColumn("rn", F.row_number().over(w2).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cosine", "rn")
        )
        return out.localCheckpoint(eager=True)
    finally:
        if resid is not None:
            resid.unpersist(blocking=False)
        corpus.unpersist(blocking=False)


@register(
    "v09_ann_ivfpq_topk",
    None,  # approximate by construction — recall vs v01 is tested in pytest
    category="llm-similarity",
    doc=(
        "IVF+PQ ANN top-5 with asymmetric distance: coarse k-means "
        "cells, PQ codebooks on cell residuals, corpus stored as "
        "8 codes/vector, per-(query,cell) lookup tables make the "
        "candidate scan dim-independent, refine-stage exact rerank. "
        "The memory story for billion-vector ANN: codes are ~32x "
        "smaller than raw floats, so shards stay executor-resident. "
        "Recall vs v01 pinned in pytest."
    ),
)
def v09_ann_ivfpq_topk(spark, sf_dir):
    # spread_scan: single-file scan -> every vector-fold/centroid
    # pass ran as ONE task (r13 profile); no-op at scale
    e = spread_scan(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    ).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    # r9 margin fix (VERDICT r8 item 5): recall@5 vs v01 was 0.71 at
    # nprobe=5/refine=96/iters=1 — 0.11 over the 0.60 bound. The sweep
    # showed the binding constraint was the REFINE WIDTH (ADC's lossy
    # ranking), not cell recall: nprobe=6 + refine=256 + iters=2
    # measures 0.91 at LOWER runtime (fewer near-miss rerank rounds),
    # matching v04's cell-recall ceiling. refine·|queries| stays a
    # constant-size exact rerank.
    return ann_topk_ivfpq(
        e, q, "vec_id", "v", k=5, n_clusters=8, nprobe=6, dim=64,
        n_codes=32, refine=256, iters=2,
    )
