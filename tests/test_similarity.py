"""Similarity-search properties (SURVEY.md §5.5): ANN recall vs the exact
oracle, cosine correctness vs numpy."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.functions.similarity import (
    ann_topk_lsh,
    cosine_sim,
    exact_topk,
    to_double_array,
)


def _vectors(spark, n=200, dim=16, seed=5):
    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), rows


def test_cosine_matches_python(spark):
    df, rows = _vectors(spark, n=20, dim=8)
    a = df.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    got = {
        (r.ia, r.ib): r.c
        for r in a.crossJoin(b)
        .withColumn("c", cosine_sim(F.col("va"), F.col("vb")))
        .collect()
    }
    vecs = dict(rows)
    for (ia, ib), c in got.items():
        va, vb = vecs[ia], vecs[ib]
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        assert abs(c - dot / (na * nb)) < 1e-9


def test_exact_topk_is_true_topk(spark):
    df, rows = _vectors(spark, n=100, dim=8)
    q = df.filter(F.col("vec_id") < 5)
    got = exact_topk(df, q, "vec_id", "v", k=3).collect()
    vecs = dict(rows)
    for qid in range(5):
        mine = sorted(
            [(r.neighbor_id, r.cosine) for r in got if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
            )
        brute = sorted(
            (
                (i, round(cos(vecs[qid], v), 6))
                for i, v in rows
                if i != qid
            ),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        assert mine == brute, qid


def test_ann_recall_vs_exact(spark):
    """Multi-table LSH recovers most of the exact top-5 even on hard
    (near-orthogonal gaussian) data: recall ≈ 1-(1-p^planes)^tables."""
    df, _ = _vectors(spark, n=300, dim=16)
    q = df.filter(F.col("vec_id") < 20)
    exact = exact_topk(df, q, "vec_id", "v", k=5).collect()
    ann = ann_topk_lsh(
        df, q, "vec_id", "v", k=5, n_planes=4, n_tables=10, dim=16, seed=42
    ).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in ann}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall


def test_ann_deterministic(spark):
    df, _ = _vectors(spark, n=100, dim=16)
    q = df.filter(F.col("vec_id") < 5)
    r1 = sorted(map(tuple, ann_topk_lsh(df, q, k=3, n_planes=4, n_tables=6, dim=16).collect()))
    r2 = sorted(map(tuple, ann_topk_lsh(df, q, k=3, n_planes=4, n_tables=6, dim=16).collect()))
    assert r1 == r2


def test_ivf_recall_vs_exact(spark):
    """IVF (cluster-then-probe) recovers most of the exact top-5; on
    clusterable data (planted blobs) a small probe fraction suffices."""
    import random

    rng = random.Random(5)
    # 6 gaussian blobs: clusterable, unlike the uniform _vectors corpus
    centers = [[rng.gauss(0, 5) for _ in range(16)] for _ in range(6)]
    rows = [
        (i, [c + rng.gauss(0, 0.5) for c in centers[i % 6]]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter(F.col("vec_id") < 15)
    from datalake_worker_spark.functions.similarity import ann_topk_ivf

    exact = exact_topk(df, q, "vec_id", "v", k=5).collect()
    ivf = ann_topk_ivf(
        df, q, "vec_id", "v", k=5, n_clusters=6, nprobe=2, dim=16, iters=2
    ).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in ivf}
    assert len(e & a) / len(e) >= 0.9, len(e & a) / len(e)


def test_ivf_deterministic_across_runs(spark):
    from datalake_worker_spark.functions.similarity import ann_topk_ivf

    df, _ = _vectors(spark, n=120, dim=16)
    q = df.filter(F.col("vec_id") < 5)
    r1 = sorted(map(tuple, ann_topk_ivf(df, q, k=3, n_clusters=4, nprobe=2, dim=16).collect()))
    r2 = sorted(map(tuple, ann_topk_ivf(df, q, k=3, n_clusters=4, nprobe=2, dim=16).collect()))
    assert r1 == r2


def test_semantic_dedup_drops_planted_duplicates(spark):
    """Planted near-identical pairs: the larger id of each pair is
    dropped, everything else kept, and output covers every input row."""
    import random

    from datalake_worker_spark.functions.similarity import semantic_dedup

    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    # ids 100.. are near-copies of ids 0..9 (tiny perturbation)
    for i in range(10):
        rows.append((100 + i, [x * 1.000001 for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = semantic_dedup(df, "vec_id", "v", n_clusters=4, dim=16, threshold=0.99)
    got = {r.vec_id: r.keep for r in out.collect()}
    assert len(got) == 50  # every input row classified
    for i in range(10):
        assert got[100 + i] == 0, f"copy {100+i} not dropped"
        assert got[i] == 1, f"original {i} not kept"
    # non-duplicated vectors all kept (random gaussians are far apart)
    for i in range(10, 40):
        assert got[i] == 1, f"unique {i} wrongly dropped"


def test_semantic_dedup_deterministic(spark):
    from datalake_worker_spark.functions.similarity import semantic_dedup

    df, _ = _vectors(spark, n=100, dim=16)
    r1 = sorted(map(tuple, semantic_dedup(df, "vec_id", "v", n_clusters=4, dim=16).collect()))
    r2 = sorted(map(tuple, semantic_dedup(df, "vec_id", "v", n_clusters=4, dim=16).collect()))
    assert r1 == r2


def test_pq_codebooks_deterministic_and_better_than_mean(spark, sf_dir):
    """PQ contract: (1) codebooks are bit-stable across runs (no RNG —
    sha-ranked sample in fixed order, fixed-order summation); (2)
    nearest-codeword reconstruction beats
    the trivial 1-code (global mean) quantizer in every subspace."""
    from datalake_worker_spark.functions.similarity import (
        pq_codebooks,
        to_double_array,
    )
    from datalake_worker_spark.registry import REGISTRY
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    b1 = pq_codebooks(e, "vec_id", "v", dim=64, n_sub=8, n_codes=16, iters=2)
    b2 = pq_codebooks(e, "vec_id", "v", dim=64, n_sub=8, n_codes=16, iters=2)
    assert b1 == b2

    audit = {
        r["subspace"]: r["rmse"]
        for r in REGISTRY["v08_pq_quantization_audit"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(audit) == set(range(8))
    # trivial quantizer: every subvector reconstructed as its subspace mean
    import math

    rows = e.select("v").collect()
    import numpy as np

    mat = np.array([r["v"] for r in rows])
    for m in range(8):
        sub = mat[:, m * 8 : (m + 1) * 8]
        mean_rmse = math.sqrt(((sub - sub.mean(axis=0)) ** 2).sum(axis=1).mean() / 8)
        assert audit[m] < mean_rmse, (m, audit[m], mean_rmse)


def test_ivfpq_recall_vs_exact(spark):
    """IVF+PQ with ADC + refine recovers most of the exact top-5 on
    clusterable data (planted blobs): PQ ranks candidates via lookup
    tables only, the refine stage restores exact ordering."""
    import random

    from datalake_worker_spark.functions.similarity import ann_topk_ivfpq

    rng = random.Random(7)
    centers = [[rng.gauss(0, 5) for _ in range(16)] for _ in range(6)]
    rows = [
        (i, [c + rng.gauss(0, 0.5) for c in centers[i % 6]]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter(F.col("vec_id") < 15)
    exact = exact_topk(df, q, "vec_id", "v", k=5).collect()
    pq = ann_topk_ivfpq(
        df, q, "vec_id", "v", k=5, n_clusters=6, nprobe=2, dim=16,
        n_sub=4, n_codes=16, iters=2, refine=48,
    ).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in pq}
    assert len(e & a) / len(e) >= 0.85, len(e & a) / len(e)


def test_ivfpq_deterministic_across_runs(spark):
    from datalake_worker_spark.functions.similarity import ann_topk_ivfpq

    df, _ = _vectors(spark, n=120, dim=16)
    q = df.filter(F.col("vec_id") < 5)
    kw = dict(k=3, n_clusters=4, nprobe=2, dim=16, n_sub=4, n_codes=8, refine=24)
    r1 = sorted(map(tuple, ann_topk_ivfpq(df, q, **kw).collect()))
    r2 = sorted(map(tuple, ann_topk_ivfpq(df, q, **kw).collect()))
    assert r1 == r2


def test_v14_fold_bucketer_equals_numpy_path(spark, sf_dir):
    """The v14 audit twin (JVM-fold projections) must produce EXACTLY
    the rows of v02's numpy-matmul bucketer ON THE SAME (sha-restricted)
    corpus: both bucketers compute the same signs — the 96k-projection
    bit-identity check, end-to-end.

    The equality claim is only meaningful if no projection sits at a
    sign boundary — the two paths sum in different orders, so a
    projection within FP-associativity noise of 0 could legitimately
    flip a bucket (ADVICE r11). The guard below makes the invariant
    self-checking: every audited projection is at least 1e-9 from 0,
    so order-of-summation noise (~1e-13 relative) cannot flip a sign."""
    import numpy as np

    from datalake_worker_spark.functions.similarity import (
        ann_topk_lsh,
        hyperplanes,
        to_double_array,
        v14_corpus,
    )
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    sub = v14_corpus(e)
    q = e.filter(F.col("vec_id") < 20)
    kw = dict(k=5, n_planes=6, n_tables=8, dim=64, seed=42)

    # self-check: no audited projection is within 1e-9 of zero
    planes = np.array(
        [p for t in range(8) for p in hyperplanes(64, 6, 42 + 1000 * t)],
        dtype=np.float64,
    )  # (48, 64)
    vecs = np.array(
        [r.v for r in sub.unionByName(q).collect()], dtype=np.float64
    )
    min_abs = np.abs(vecs @ planes.T).min()
    assert min_abs > 1e-9, f"projection at sign boundary: {min_abs}"

    fold = sorted(
        map(tuple, ann_topk_lsh(sub, q, "vec_id", "v", bucketer="fold", **kw).collect())
    )
    numpy_path = sorted(
        map(tuple, ann_topk_lsh(sub, q, "vec_id", "v", bucketer="numpy", **kw).collect())
    )
    assert fold == numpy_path and len(fold) > 0


def test_v14_matches_oracle(spark, sf_dir, oracle):
    """Strict hash parity for the LSH candidate pipeline — the driver
    check, run in CI too (r10 verdict item 5)."""
    from datalake_worker_spark.registry import REGISTRY

    from .conftest import assert_matches_oracle

    spec = REGISTRY["v14_lsh_candidate_audit"]
    assert_matches_oracle(
        spec.spark_fn(spark, sf_dir), oracle, spec.oracle_sql, spec.name
    )
