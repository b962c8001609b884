"""Round-10 second-wave tests: t32 Gopher repetition filter (hand-
computed metrics, planted drop/keep), d18 substring-dedup spans
(planted cross-doc + intra-doc duplicates, overlap merging, zero
rows), v13 relational k-means (python-reference replay, Lloyd descent,
tie-break, plan gates)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datalake_worker_spark.operators.wave11 import (
    D18_L,
    KM_DIM,
    KM_K,
    _km_assign,
    _km_dists,
    kmeans_train,
)
from datalake_worker_spark.plans.inspect import simple_plan
from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.Table.from_pylist(
        [
            dict(
                doc_id=i, text=s, lang="en", source="s", n_chars=len(s)
            )
            for i, s in enumerate(texts)
        ]
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# t32
# ---------------------------------------------------------------------------


def test_t32_hand_computed_metrics(spark, tmp_path):
    """doc 'x y x y z' (9 chars): top 2-gram 'x y' count 2, mass 6 ->
    6/9; top 3-gram mass 5 -> 5/9; no duplicated 5-gram -> 0."""
    sf = _write_docs(tmp_path, ["x y x y z"])
    r = REGISTRY["t32_repetition_filter"].spark_fn(spark, sf).collect()[0]
    assert r.top2gram_frac == round(6 / 9, 6)
    assert r.top3gram_frac == round(5 / 9, 6)
    assert r.dup5gram_frac == 0.0
    assert r.keep == 0  # 0.667 > 0.20


def test_t32_planted_drop_and_keep(spark, tmp_path):
    """A pathological repeater is dropped; a diverse doc is kept; a doc
    too short for any 2-gram gets zero metrics and is kept."""
    rep = "spam ham " * 30  # one dominant 2-gram
    div = " ".join(f"w{i:03d}" for i in range(60))  # all grams unique
    sf = _write_docs(tmp_path, [rep.strip(), div, "one"])
    out = {
        r.doc_id: r
        for r in REGISTRY["t32_repetition_filter"].spark_fn(spark, sf).collect()
    }
    assert out[0].keep == 0 and out[0].top2gram_frac > 0.5
    # duplicated 5-grams cover the whole repeated doc (capped at 1)
    assert out[0].dup5gram_frac == 1.0
    assert out[1].keep == 1
    assert out[1].dup5gram_frac == 0.0
    assert out[2].keep == 1
    assert out[2].top2gram_frac == 0.0


def test_t32_top_gram_is_most_frequent_not_longest(spark, tmp_path):
    """A long once-occurring gram must NOT outweigh the repeated short
    one: doc 'internationalization telecommunications xy ab xy ab xy'
    — the most frequent 2-gram is 'xy ab' (count 2, mass 10), not the
    40-char singleton pair."""
    text = "internationalization telecommunications xy ab xy ab xy"
    sf = _write_docs(tmp_path, [text])
    r = REGISTRY["t32_repetition_filter"].spark_fn(spark, sf).collect()[0]
    assert r.top2gram_frac == round(10 / len(text), 6)


def test_t32_no_join_on_gram_keys(spark, sf_dir):
    """Every shuffle key contains doc_id — the plan must contain no
    join at all except the final doc_id left join (no Zipfian
    gram-keyed join-back possible)."""
    plan = simple_plan(REGISTRY["t32_repetition_filter"].spark_fn(spark, sf_dir))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # gram never appears as a join key: the only join keys are doc_id
    for line in plan.splitlines():
        if "Join" in line and "gram" in line:
            raise AssertionError(f"gram-keyed join found: {line}")


# ---------------------------------------------------------------------------
# d18
# ---------------------------------------------------------------------------


def test_d18_planted_cross_doc_duplicate(spark, tmp_path):
    """Two docs share a 30-char run -> both get one span covering the
    run (plus the following space, which both docs also share — the
    span is the maximal common substring, not the planted phrase); a
    unique doc gets zeros."""
    shared = "The quick brown fox jumps over"  # 30 chars
    a = shared + " the lazy dog in doc zero padding text"
    b = "doc one opens differently " + shared + " and then diverges"
    c = "totally unique content with no twenty char repeats anywhere"
    sf = _write_docs(tmp_path, [a, b, c])
    out = {
        r.doc_id: r
        for r in REGISTRY["d18_substring_dedup_spans"].spark_fn(spark, sf).collect()
    }
    assert out[0].n_spans == 1 and out[0].dup_chars == len(shared) + 1
    assert out[1].n_spans == 1 and out[1].dup_chars == len(shared) + 1
    assert out[2].n_spans == 0 and out[2].dup_chars == 0
    assert out[2].dup_frac == 0.0


def test_d18_intra_doc_duplicate_and_merge(spark, tmp_path):
    """A doc repeating its own 25-char phrase marks BOTH occurrences;
    overlapping marked intervals merge into maximal spans with exact
    (non-double-counted) coverage."""
    phrase = "abcdefghijklmnopqrstuvwxy"  # 25 chars
    gap = " 123 456 789 012 345 678 "
    text = phrase + gap + phrase
    sf = _write_docs(tmp_path, [text])
    r = REGISTRY["d18_substring_dedup_spans"].spark_fn(spark, sf).collect()[0]
    # every L-gram inside each phrase occurrence is duplicated (the
    # other occurrence has it), so each occurrence is one 25-char span
    assert r.n_spans == 2
    assert r.dup_chars == 2 * len(phrase)
    assert r.dup_frac == round(2 * len(phrase) / len(text), 6)


def test_d18_full_doc_duplicate(spark, tmp_path):
    """Verbatim duplicate docs are fully covered (dup_frac 1.0) — the
    Lee et al. motivating case."""
    t = "exact duplicate document body used twice for the span test"
    sf = _write_docs(tmp_path, [t, t])
    for r in REGISTRY["d18_substring_dedup_spans"].spark_fn(spark, sf).collect():
        assert r.n_spans == 1
        assert r.dup_chars == len(t)
        assert r.dup_frac == 1.0


def test_d18_salted_join_in_plan(spark, sf_dir):
    """The Zipfian gram join-back must go through salted_join: the join
    key list includes the _salt column."""
    from datalake_worker_spark.operators.wave11 import _d18_build

    out, g = _d18_build(spark, sf_dir)
    try:
        assert "_salt" in simple_plan(out)
    finally:
        g.unpersist(blocking=False)


# ---------------------------------------------------------------------------
# v13
# ---------------------------------------------------------------------------


def _blob_of():
    """Blob membership keyed off the sha256 init ranking so the 4
    seeds (the sha-smallest ids) land one per blob — with seeds
    spread, Lloyd provably recovers tight well-separated blobs."""
    order = sorted(
        range(16), key=lambda v: hashlib.sha256(str(v).encode()).hexdigest()
    )
    return {vid: i % 4 for i, vid in enumerate(order)}, {
        vid: i // 4 for i, vid in enumerate(order)
    }


def _planted_ex(spark):
    """16 vectors in 4 tight blobs on the first two dims (all other
    dims zero): blob b at (10b + off*0.1, 10b)."""
    blob, off = _blob_of()
    rows = []
    for vid in range(16):
        b, j = blob[vid], off[vid]
        for d in range(1, KM_DIM + 1):
            x = 0.0
            if d == 1:
                x = 10.0 * b + 0.1 * j
            elif d == 2:
                x = 10.0 * b
            rows.append((vid, d, x))
    return spark.createDataFrame(rows, "vec_id long, d int, x double")


def _py_kmeans(rows, iters):
    """Plain-python replay of the relational algorithm (float math is
    fine here: the planted values are exact in binary and widely
    separated, so decimal-vs-float differences cannot flip anything)."""
    vecs = {}
    for vid, d, x in rows:
        vecs.setdefault(vid, [0.0] * KM_DIM)[d - 1] = x
    ids = sorted(vecs, key=lambda v: hashlib.sha256(str(v).encode()).hexdigest())[
        :KM_K
    ]
    cents = {j: list(vecs[i]) for j, i in enumerate(ids)}
    def assign_with(cs):
        out = {}
        for vid, v in vecs.items():
            dists = [
                (sum((a - b) ** 2 for a, b in zip(v, cs[j])), j)
                for j in range(KM_K)
            ]
            out[vid] = min(dists)[1]
        return out

    for _ in range(iters):
        assign = assign_with(cents)
        for j in range(KM_K):
            members = [vecs[v] for v, c in assign.items() if c == j]
            if members:
                cents[j] = [
                    round(sum(col) / len(members), 6) for col in zip(*members)
                ]
    # the comparable quantity is the assignment under the FINAL
    # centroids (what the Spark side computes), not the loop-carried
    # pre-update assignment
    return cents, assign_with(cents)


def test_v13_matches_python_reference(spark):
    ex = _planted_ex(spark)
    rows = [(r.vec_id, r.d, r.x) for r in ex.collect()]
    want_cents, want_assign = _py_kmeans(rows, 2)
    cents = kmeans_train(ex, iters=2)
    for j in range(KM_K):
        assert cents[j] == want_cents[j], f"cluster {j}"
    got = {
        r.vec_id: r.cluster
        for r in _km_assign(_km_dists(ex, cents)).collect()
    }
    assert got == want_assign


def test_v13_blobs_recovered(spark):
    """After 2 rounds the 4 planted blobs are exactly the 4 clusters."""
    ex = _planted_ex(spark)
    blob, _ = _blob_of()
    cents = kmeans_train(ex, iters=2)
    a = {r.vec_id: r.cluster for r in _km_assign(_km_dists(ex, cents)).collect()}
    for b in range(4):
        got = {a[v] for v in range(16) if blob[v] == b}
        assert len(got) == 1, f"blob {b} split across clusters: {got}"


def test_v13_lloyd_descent(spark, sf_dir):
    """Within-cluster SSE is non-increasing across rounds (6-dp
    centroid rounding can wiggle the tail, hence the epsilon)."""
    from datalake_worker_spark.operators.wave11 import _km_exploded

    ex = _km_exploded(spark, sf_dir).cache()
    sses = []
    for iters in (0, 1, 2, 3):
        cents = kmeans_train(ex, iters=iters)
        sse = (
            _km_assign(_km_dists(ex, cents))
            .agg(F.sum(F.col("mdist").cast("double")))
            .collect()[0][0]
        )
        sses.append(sse)
    ex.unpersist()
    for a, b in zip(sses, sses[1:]):
        assert b <= a + 1e-6, sses


def test_v13_argmin_tie_takes_lowest_cluster(spark):
    """A vector exactly between two centroids lands in the lower id."""
    rows = [(0, d, 0.0) for d in range(1, KM_DIM + 1)]
    ex = spark.createDataFrame(rows, "vec_id long, d int, x double")
    cents = {j: [0.0] * KM_DIM for j in range(KM_K)}
    cents[1][0] = 1.0
    cents[2][0] = 1.0  # clusters 1 and 2 equidistant; 0 and 3 at 0
    cents[0][0] = 1.0
    cents[3][0] = 1.0  # all four equidistant now
    got = _km_assign(_km_dists(ex, cents)).collect()[0]
    assert got.cluster == 0


def test_v13_distance_plan_no_join_one_exchange(spark, sf_dir):
    """Centroids enter as literals: the distance aggregation plan has
    NO join and exactly one exchange (the vec_id groupBy)."""
    from datalake_worker_spark.operators.wave11 import _km_exploded, _km_init

    ex = _km_exploded(spark, sf_dir)
    cents = _km_init(ex)
    plan = simple_plan(_km_dists(ex, cents))
    assert "Join" not in plan
    # at most one AGGREGATION exchange. The r13 spread_scan adds a
    # REPARTITION_BY_NUM exchange that parallelizes the single-file
    # scan — a scan-shape device, not part of the distance algebra, and
    # its hashpartitioning(vec_id) SATISFIES the groupBy distribution,
    # so the aggregation itself plans exchange-FREE on top of it (zero
    # agg exchanges); when the exploded frame comes from cache the
    # repartition is hidden and the single vec_id agg exchange
    # reappears. Both states honor the gate's intent: no join, never
    # more than one aggregation shuffle. (Counting raw "Exchange"
    # occurrences was cache-state dependent — AQE re-prints executed
    # stages under an Initial Plan section.)
    final_section = plan.split("== Initial Plan ==")[0]
    agg_ex = [
        ln
        for ln in final_section.splitlines()
        if "Exchange" in ln
        and "REPARTITION_BY_NUM" not in ln
        and "ReusedExchange" not in ln
    ]
    assert len(agg_ex) <= 1, plan


# ---------------------------------------------------------------------------
# randomized differential tests (the t32 review lesson operationalized:
# oracle-MIRRORED spec bugs are invisible to the parity harness, so the
# spec is pinned against an INDEPENDENT python reference on a seeded
# random corpus engineered for collisions)
# ---------------------------------------------------------------------------


def _py_t32(texts):
    """Independent python implementation of the Gopher metrics."""
    import collections

    out = {}
    for i, s in enumerate(texts):
        w = s.strip().split()
        nc = len(s)
        fr = {}
        for n in (2, 3, 5):
            c = collections.Counter(
                " ".join(w[j : j + n]) for j in range(len(w) - n + 1)
            )
            if n == 5:
                fr[n] = sum(
                    cnt * len(g) for g, cnt in c.items() if cnt >= 2
                )
            elif c:
                # most frequent gram; max char mass among count ties
                fr[n] = max((cnt, cnt * len(g)) for g, cnt in c.items())[1]
            else:
                fr[n] = 0
        out[i] = tuple(
            round(min(fr[n] / nc, 1.0), 6) for n in (2, 3, 5)
        )
    return out


def _py_d18(texts, L):
    """Independent python implementation of the dedup spans."""
    import collections

    c = collections.Counter(
        s[j : j + L] for s in texts for j in range(len(s) - L + 1)
    )
    out = {}
    for i, s in enumerate(texts):
        pos = [j for j in range(len(s) - L + 1) if c[s[j : j + L]] >= 2]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + L - 1))
            else:
                spans.append((p, p + L - 1))
        out[i] = (len(spans), sum(e - s0 + 1 for s0, e in spans))
    return out


def _random_corpus(seed=7, n_docs=60, vocab=14):
    """Small vocabulary + repeated phrases force gram collisions both
    within and across docs."""
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    phrases = [
        " ".join(rng.choices(words, k=6)) for _ in range(4)
    ]  # shared boilerplate
    texts = []
    for _ in range(n_docs):
        parts = []
        for _ in range(rng.randint(2, 10)):
            if rng.random() < 0.3:
                parts.append(rng.choice(phrases))
            else:
                parts.append(" ".join(rng.choices(words, k=rng.randint(1, 6))))
        texts.append(" ".join(parts))
    return texts


def test_t32_randomized_vs_python_reference(spark, tmp_path):
    texts = _random_corpus()
    sf = _write_docs(tmp_path, texts)
    want = _py_t32(texts)
    got = {
        r.doc_id: (r.top2gram_frac, r.top3gram_frac, r.dup5gram_frac)
        for r in REGISTRY["t32_repetition_filter"].spark_fn(spark, sf).collect()
    }
    assert got == want


def test_d18_randomized_vs_python_reference(spark, tmp_path):
    texts = _random_corpus(seed=11)
    sf = _write_docs(tmp_path, texts)
    want = _py_d18(texts, D18_L)
    got = {
        r.doc_id: (r.n_spans, r.dup_chars)
        for r in REGISTRY["d18_substring_dedup_spans"].spark_fn(spark, sf).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q25: degree-oriented triangle counting
# ---------------------------------------------------------------------------


def _write_lineitem(tmp_path, orders):
    """orders: list of supplier lists; order k gets orderkey k."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for ok, supps in enumerate(orders):
        for i, s in enumerate(supps):
            rows.append(
                dict(
                    l_orderkey=ok,
                    l_partkey=i,
                    l_suppkey=s,
                    l_linenumber=i,
                    l_quantity=1.0,
                    l_extendedprice=1.0,
                    l_discount=0.0,
                    l_tax=0.0,
                    l_returnflag="N",
                    l_linestatus="O",
                    l_shipdate=None,
                )
            )
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_q25_planted_triangle(spark, tmp_path):
    """Suppliers {1,2,3} co-occur in 10 orders (above the P90 cut);
    noise pairs occur once (below). Exactly one triangle; each member
    participates once; the noise suppliers survive with degree >= 1
    only if their pair passes the threshold (it doesn't)."""
    orders = [[1, 2, 3]] * 10 + [[4, 5], [6, 7], [8, 9], [10, 11]]
    sf = _write_lineitem(tmp_path, orders)
    out = {
        r.suppkey: r
        for r in REGISTRY["q25_supplier_triangles"].spark_fn(spark, sf).collect()
    }
    # P90 rank over 7 pairs (3 triangle pairs c=10, 4 noise c=1):
    # ceil(.9*7)=7 -> threshold 10 -> only the triangle edges survive
    assert set(out) == {1, 2, 3}
    for s in (1, 2, 3):
        assert out[s].n_triangles == 1
        assert out[s].degree == 2


def test_q25_triangle_identity(spark, sf_dir):
    """Sum of per-node participation = 3 * number of triangles (every
    triangle counted exactly once by the orientation)."""
    rows = REGISTRY["q25_supplier_triangles"].spark_fn(spark, sf_dir).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0


def test_q25_no_global_sort(spark, sf_dir):
    """The quantile threshold comes from the count-of-counts histogram,
    never a global sort: no range-partitioning exchange in the plan."""
    from datalake_worker_spark.operators.wave11 import _q25_build

    out, pairs, o = _q25_build(spark, sf_dir)
    try:
        assert "rangepartitioning" not in simple_plan(out).lower()
    finally:
        pairs.unpersist(blocking=False)
        o.unpersist(blocking=False)
