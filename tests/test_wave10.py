"""Round-10 operator tests: a18 KMV bottom-k distinct sketch (exact
small-set branch, two-phase bottom-k correctness vs a direct global
rank, planted set-algebra accuracy under a binding cap, plan gate) and
t30 BPE subword tokenization."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from datalake_worker_spark.operators.wave10 import (
    KMV_K,
    kmv_kmin,
    kmv_set_estimates,
)
from datalake_worker_spark.plans.inspect import simple_plan
from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


def _planted(spark):
    """A=0..999, B=500..1499, C=1200..1699 — known set algebra."""
    return (
        spark.range(0, 1000).select(F.lit("A").alias("s"), F.col("id"))
        .unionByName(
            spark.range(500, 1500).select(F.lit("B").alias("s"), F.col("id"))
        )
        .unionByName(
            spark.range(1200, 1700).select(F.lit("C").alias("s"), F.col("id"))
        )
    )


def test_kmv_two_phase_equals_global_rank(spark):
    """The bucketed two-phase bottom-k is a parallelism device only:
    its k-min set must EQUAL the k smallest sha256 digests computed
    directly in Python over the distinct values."""
    k = 32
    kmin = kmv_kmin(_planted(spark), "s", "id", k=k).collect()
    got = {}
    for r in kmin:
        got.setdefault(r.src, []).append((r.rn, r.h))
    for s, lo, hi in (("A", 0, 1000), ("B", 500, 1500), ("C", 1200, 1700)):
        want = sorted(
            hashlib.sha256(str(i).encode()).hexdigest() for i in range(lo, hi)
        )[:k]
        rows = sorted(got[s])
        assert [h for _, h in rows] == want
        assert [rn for rn, _ in rows] == list(range(1, k + 1))


def test_kmv_exact_branch_small_sets(spark):
    """Sets smaller than k: every estimate is EXACT (the sketch kept
    every distinct hash)."""
    est = {
        (r.src_a, r.src_b): r
        for r in kmv_set_estimates(
            kmv_kmin(_planted(spark), "s", "id", k=4096), k=4096
        ).collect()
    }
    A = set(range(0, 1000)); B = set(range(500, 1500)); C = set(range(1200, 1700))
    for (sa, sb), (a, b) in (
        (("A", "B"), (A, B)), (("A", "C"), (A, C)), (("B", "C"), (B, C)),
    ):
        r = est[(sa, sb)]
        assert r.est_a == len(a) and r.est_b == len(b)
        assert r.est_union == len(a | b)
        assert abs(r.est_intersect - len(a & b)) < 1e-9
        assert abs(r.est_except_a - len(a - b)) < 1e-9


def test_kmv_planted_accuracy_binding_cap(spark):
    """k=64 binds on all three 500-1500-element sets; every estimate
    within the KMV 3-sigma bound 3/sqrt(k-2) (union-relative for
    intersect/except, whose sampling frame is the union)."""
    k = 64
    bound = 3.0 / math.sqrt(k - 2)
    A = set(range(0, 1000)); B = set(range(500, 1500)); C = set(range(1200, 1700))
    P = {"A": A, "B": B, "C": C}
    for r in kmv_set_estimates(
        kmv_kmin(_planted(spark), "s", "id", k=k), k=k
    ).collect():
        a, b = P[r.src_a], P[r.src_b]
        u = len(a | b)
        assert abs(r.est_a - len(a)) / len(a) <= bound
        assert abs(r.est_b - len(b)) / len(b) <= bound
        assert abs(r.est_union - u) / u <= bound
        assert abs(r.est_intersect - len(a & b)) / u <= bound
        assert abs(r.est_except_a - len(a - b)) / u <= bound


def test_kmv_registry_query_shape(spark, sf_dir):
    out = REGISTRY["a18_kmv_distinct_sketch"].spark_fn(spark, sf_dir).collect()
    srcs = {r.src_a for r in out} | {r.src_b for r in out}
    n = len(srcs)
    assert len(out) == n * (n - 1) // 2  # every unordered pair
    for r in out:
        assert r.src_a < r.src_b
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
        assert r.est_intersect >= -1e-9
        assert r.est_except_a >= 0.0


def test_kmv_plan_gate(spark, sf_dir):
    """Scale gate: the only data-scale shuffles are the distinct and
    the two bottom-k phases — Spark 4's WindowGroupLimit prunes each
    window input to k rows per partition BEFORE its exchange, so no
    stage ever sorts a full source. All pair algebra on the
    summary-sized frames must run as broadcast joins: a SortMergeJoin
    anywhere means a model-state frame got shuffled like data."""
    df = REGISTRY["a18_kmv_distinct_sketch"].spark_fn(spark, sf_dir)
    df.collect()
    plan = simple_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan  # map-side top-k prune engaged
    assert plan.count("Exchange hashpartitioning") <= 8
    assert plan.count("ReusedExchange") >= 1  # kmin subtree computed once


# --------------------------------------------------------------- t30 BPE

def _ref_bpe(word_counts: dict, n: int):
    """Pure-Python Sennrich BPE: get_stats + greedy left-to-right merge,
    tie-break (count desc, pair asc) — the semantics bpe_train must
    reproduce relationally."""
    from collections import Counter

    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n):
        pairs = Counter()
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (x, y), c = best
        merges.append((x, y, c))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == x and seq[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def _train_on(spark, word_counts: dict, n: int):
    from datalake_worker_spark.operators.wave10 import bpe_train

    words = spark.createDataFrame(
        list(word_counts.items()), "word string, w long"
    )
    merges, final = bpe_train(words, n)
    seqs = {}
    for r in sorted(final.collect(), key=lambda r: (r.word, r.pos)):
        seqs.setdefault(r.word, []).append(r.sym)
    return merges, seqs


def test_bpe_matches_python_reference(spark):
    """8 relational merge rounds == the sequential Sennrich algorithm:
    identical merge table (pairs AND weighted counts) and identical
    final symbol sequence for every word."""
    corpus = {
        "the": 10, "then": 4, "they": 3, "cat": 6, "cats": 2,
        "banana": 5, "bandana": 2, "ananas": 1, "aaaa": 3, "aaa": 2,
        "ab": 7, "abab": 1, "b": 4, "x": 1,
    }
    want_merges, want_seqs = _ref_bpe(dict(corpus), 8)
    got_merges, got_seqs = _train_on(spark, corpus, 8)
    assert got_merges == want_merges
    assert got_seqs == want_seqs


def test_bpe_greedy_run_parity(spark):
    """The x==x overlapping-run cases that break naive merge-apply:
    greedy left-to-right must give aaaa->aa|aa, aaa->aa|a, and
    resynchronize across non-matches."""
    corpus = {"aaaa": 5, "aaa": 5, "baaa": 5, "aabaa": 5}
    want_merges, want_seqs = _ref_bpe(dict(corpus), 1)
    got_merges, got_seqs = _train_on(spark, corpus, 1)
    assert got_merges == want_merges  # (a, a) wins round 1
    assert got_seqs == want_seqs
    assert got_seqs["aaaa"] == ["aa", "aa"]
    assert got_seqs["aaa"] == ["aa", "a"]
    assert got_seqs["baaa"] == ["b", "aa", "a"]
    assert got_seqs["aabaa"] == ["aa", "b", "aa"]


def test_bpe_fewer_pairs_than_rounds(spark):
    """A vocabulary that runs out of pairs: training stops early
    instead of looping or corrupting state."""
    merges, seqs = _train_on(spark, {"ab": 3, "c": 1}, 10)
    assert [(x, y) for x, y, _ in merges] == [("a", "b")]
    assert seqs == {"ab": ["ab"], "c": ["c"]}


def test_bpe_registry_query_invariants(spark, sf_dir):
    """Per-language counts are internally consistent: words <= tokens
    (every word is >= 1 token), the top merged token is >= 2 chars,
    and every language present in the corpus words appears."""
    out = REGISTRY["t30_bpe_subword_tokens"].spark_fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_tokens >= r.n_words > 0
        assert len(r.top_merged) >= 2
        assert r.top_token_n >= r.top_merged_n > 0


# ----------------------------------------------------------- t31 logreg
def _collect_feat(spark, sf_dir):
    import numpy as np

    from datalake_worker_spark.operators.wave10 import _logreg_features
    from datalake_worker_spark.sources import load_table

    rows = _logreg_features(load_table(spark, sf_dir, "documents")).collect()
    X = np.array([[1.0, r.x1, r.x2, r.x3] for r in rows])
    y = np.array([r.y for r in rows])
    return X, y


def test_logreg_first_step_matches_numpy(spark, sf_dir):
    """One GD round from w=0 must land within float-noise of the
    straight numpy gradient step (bit-exactness is the ORACLE's job;
    this pins the math itself — sign, scale, mean-not-sum)."""
    import numpy as np

    from datalake_worker_spark.operators.wave10 import (
        _logreg_features,
        logreg_train,
    )
    from datalake_worker_spark.sources import load_table

    feat = _logreg_features(load_table(spark, sf_dir, "documents"))
    w1 = np.array(logreg_train(feat, t=1))
    X, y = _collect_feat(spark, sf_dir)
    g = (0.5 - y) @ X / len(y)  # sigmoid(0) = 0.5 exactly
    np.testing.assert_allclose(w1, -0.25 * g, atol=1e-5)


def test_logreg_loss_decreases(spark, sf_dir):
    """5 rounds at LR=0.25 must strictly reduce logloss vs w=0 (ln 2):
    the feature scaling fixes the Hessian bound L ~ 0.5, so LR < 1/L
    guarantees descent — measured, not assumed."""
    import numpy as np

    from datalake_worker_spark.operators.wave10 import (
        _logreg_features,
        logreg_train,
    )
    from datalake_worker_spark.sources import load_table

    feat = _logreg_features(load_table(spark, sf_dir, "documents"))
    w = np.array(logreg_train(feat, t=5))
    X, y = _collect_feat(spark, sf_dir)
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert loss < np.log(2.0) * 0.999, loss


def test_logreg_plan_gates(spark, sf_dir):
    """Gradient round = ONE exchange (map-side partial DECIMAL sums
    are the merge); final scoring = ZERO exchanges (narrow map over
    the persisted feature frame)."""
    from pyspark.sql import functions as F

    from datalake_worker_spark.operators.wave10 import (
        _logreg_features,
        _logreg_p,
    )
    from datalake_worker_spark.sources import load_table

    feat = _logreg_features(load_table(spark, sf_dir, "documents"))
    r = (_logreg_p((0.0, 0.0, 0.0, 0.0)) - F.col("y")).alias("r")
    agg = feat.select(r, "x1").agg(
        F.sum(F.round(F.col("r") * F.col("x1"), 9).cast("decimal(28,9)"))
    )
    plan = simple_plan(agg).split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, plan
    assert "partial" in plan.lower(), plan
    scored = REGISTRY["t31_quality_logreg"].spark_fn(spark, sf_dir)
    splan = simple_plan(scored).split("== Initial Plan ==")[0]
    # the gate's intent: SCORING adds no exchange — it is a narrow map
    # over the persisted feature frame. The gate inspects only the plan
    # ABOVE the cache read so the cached relation's own build plan stays
    # free to change shape (r13 added a spread_scan repartition there;
    # the r14 clean A/B reverted it).
    above_cache = splan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in splan, splan
    assert "Exchange" not in above_cache, splan


# ----------------------------------------------------------- v12 knn join
def test_v12_equals_broadcast_exact(spark, sf_dir):
    """The grid-blocked join is a parallelism device only: rows must
    EQUAL v01's broadcast exact path on the same query set."""
    from pyspark.sql import functions as F

    from datalake_worker_spark.functions.similarity import (
        exact_topk,
        to_double_array,
    )
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") % 10 == 0)
    want = sorted(map(tuple, exact_topk(e, q, k=3).collect()))
    got = sorted(
        map(
            tuple,
            REGISTRY["v12_exact_knn_join"].spark_fn(spark, sf_dir).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_v12_cross_cell_ties(spark):
    """All-identical vectors: every cosine rounds to 1.0, so the
    global top-3 is decided purely by neighbor_id ASC across ALL grid
    cells — the cell-boundary tie case the per-cell slack must
    survive. 64 ids spread over every (qb, cb) cell."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from datalake_worker_spark.operators.wave10 import _knn_cell_fn

    # direct cell check: ties keep smallest neighbor ids
    left = pd.DataFrame(
        {"query_id": [0], "v": [[1.0, 0.0]], "qb": [0], "cb": [0]}
    )
    right = pd.DataFrame(
        {
            "vec_id": [9, 3, 5, 0, 7],
            "cv": [[2.0, 0.0]] * 5,
            "cb": [0] * 5,
            "qb": [0] * 5,
        }
    )
    out = _knn_cell_fn(left, right)
    assert list(out["neighbor_id"][:3]) == [3, 5, 7]  # self (0) excluded
    # end-to-end: registry-shaped frame with identical vectors
    root = str(spark._jvm.java.lang.System.getProperty("java.io.tmpdir"))
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="dlw_v12_ties_")
    n = 64
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array([F.lit(1.0)] * 8).cast("array<float>").alias("embedding"),
            F.lit(0).alias("label"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(root, "embeddings.parquet"))
    )
    rows = REGISTRY["v12_exact_knn_join"].spark_fn(spark, root).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rn, r.neighbor_id, r.cosine))
    for qid, nbrs in by_q.items():
        expect = [i for i in range(n) if i != qid][:3]
        assert [x[1] for x in sorted(nbrs)] == expect, (qid, nbrs)
        assert all(abs(x[2] - 1.0) < 1e-9 for x in nbrs)
    assert len(by_q) == len([i for i in range(0, n, 10)])


def test_v12_empty_cell_sides(spark):
    import pandas as pd

    from datalake_worker_spark.operators.wave10 import _knn_cell_fn

    empty_l = pd.DataFrame({"query_id": [], "v": [], "qb": [], "cb": []})
    right = pd.DataFrame(
        {"vec_id": [1], "cv": [[1.0]], "cb": [0], "qb": [0]}
    )
    assert len(_knn_cell_fn(empty_l, right)) == 0
    empty_r = pd.DataFrame({"vec_id": [], "cv": [], "cb": [], "qb": []})
    left = pd.DataFrame(
        {"query_id": [1], "v": [[1.0]], "qb": [0], "cb": [0]}
    )
    assert len(_knn_cell_fn(left, empty_r)) == 0


def test_v12_plan_gate(spark, sf_dir):
    """Grid join shape: one cogrouped Arrow stage (both sides
    co-partitioned exchanges), partial top-k pushed below the final
    window shuffle (WindowGroupLimit map- AND reduce-side), and the
    only broadcasts are the 4/8-row grid dims (BNLJ count == 2)."""
    df = REGISTRY["v12_exact_knn_join"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).split("== Initial Plan ==")[0]
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan


def test_v12_grid_scales_with_input():
    """r10 verdict item 1: the replication grid is a function of the
    side counts, not a compile-time constant. Cells grow linearly with
    |Q|*|C|; the A/B split tracks sqrt(|Q|/|C|) (Okcan & Riedewald's
    replication-minimizing split); per-cell work stays ~pair-budget."""
    from datalake_worker_spark.operators.wave10 import (
        KNN_CELL_PAIRS,
        knn_grid,
    )

    a1, b1 = knn_grid(6_000, 60_000)          # ~sf1 shape
    a2, b2 = knn_grid(60_000, 600_000)        # 100x pairs
    a3, b3 = knn_grid(600_000, 6_000_000)     # 10,000x pairs
    assert a1 * b1 < a2 * b2 < a3 * b3
    for (a, b), (nq, nc) in [
        ((a1, b1), (6_000, 60_000)),
        ((a2, b2), (60_000, 600_000)),
        ((a3, b3), (600_000, 6_000_000)),
    ]:
        cells = math.ceil(nq * nc / KNN_CELL_PAIRS)
        # grid covers the required cell count without gross overshoot
        assert cells <= a * b <= 4 * cells
        # per-cell pairs bounded by ~the budget (rounding slack only)
        assert (nq / a) * (nc / b) <= 2.0 * KNN_CELL_PAIRS
        # the optimal split: A/B within 4x of sqrt(|Q|/|C|)
        want = math.sqrt(nq / nc)
        assert want / 4 <= a / b <= want * 4
    # degenerate inputs never produce a zero or oversized axis
    assert knn_grid(1, 1) == (1, 1)
    assert knn_grid(0, 5, min_cells=8)[0] >= 1
    a, b = knn_grid(3, 1_000_000, min_cells=32)
    assert a <= 3 and b >= 1


def test_v12_stripe_kernel_equals_unblocked(monkeypatch):
    """The row-striped in-cell matmul is a memory device only: with a
    stripe budget so small every stripe is one row, the kernel output
    must be identical to the one-shot matrix path."""
    import numpy as np
    import pandas as pd

    import datalake_worker_spark.operators.wave10 as w10

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "query_id": np.arange(9, dtype=np.int64),
            "v": [rng.randn(16).tolist() for _ in range(9)],
            "qb": [0] * 9,
            "cb": [0] * 9,
        }
    )
    right = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "cv": [rng.randn(16).tolist() for _ in range(40)],
            "cb": [0] * 40,
            "qb": [0] * 40,
        }
    )
    big = w10._knn_cell_fn(left, right)
    monkeypatch.setattr(w10, "KNN_STRIPE_FLOATS", 1)  # 1-row stripes
    small = w10._knn_cell_fn(left, right)
    pd.testing.assert_frame_equal(
        big.reset_index(drop=True), small.reset_index(drop=True)
    )


def _bpe_vocab(spark, rows):
    return spark.createDataFrame(rows, "word string, w long")


def test_t30_min_freq_floor_merges_bit_identical(spark):
    """The 100 TB training bound: a rare-word floor whose dropped tail
    mass is below every argmax margin leaves the merge table
    BIT-IDENTICAL (r10 verdict item 6). Head words carry ~100x the
    tail's total weight; 40 hapax words are dropped by min_freq=2."""
    from datalake_worker_spark.operators.wave10 import bpe_train

    head = [("banana", 400), ("bandana", 300), ("cabana", 200), ("ban", 150)]
    # 40 distinct hapax words, total mass 40 << every pair-count margin
    tail = [
        ("".join(chr(ord("d") + (i * 7 + j) % 20) for j in range(5)), 1)
        for i in range(40)
    ]
    full = _bpe_vocab(spark, head + tail)
    m_full, _ = bpe_train(full, 6)
    m_floor, _ = bpe_train(full, 6, min_freq=2)
    assert [(x, y) for x, y, _ in m_full] == [(x, y) for x, y, _ in m_floor]
    assert len(m_full) == 6
    # the floor really dropped the tail: retrain on head-only matches too
    m_head, _ = bpe_train(_bpe_vocab(spark, head), 6)
    assert [(x, y) for x, y, _ in m_floor] == [(x, y) for x, y, _ in m_head]


def test_t30_max_vocab_bound_is_take_ordered_head(spark):
    """max_vocab trains on the top-N (weight desc, word asc) rows —
    deterministic, and identical to training on that explicit head."""
    from datalake_worker_spark.operators.wave10 import bpe_train

    rows = [("aaab", 50), ("aabb", 40), ("abbb", 30), ("zzzz", 2), ("zzyz", 1)]
    m_cap, _ = bpe_train(_bpe_vocab(spark, rows), 4, max_vocab=3)
    m_head, _ = bpe_train(_bpe_vocab(spark, rows[:3]), 4)
    assert [(x, y) for x, y, _ in m_cap] == [(x, y) for x, y, _ in m_head]
