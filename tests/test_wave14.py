"""Round-13 operators: v16 IVF+PQ strict audit, m09 pHash audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


# ----------------------------------------------------------------- m09
def _py_grid_phash(text: str) -> int:
    """Pure-Python replica of m09's 63-cell character-grid aHash."""
    vals = [ord(c) for c in text]
    n = len(vals)
    if n == 0:
        return None
    s = [0] * 63
    c = [0] * 63
    for p, v in enumerate(vals):
        b = (p * 63) // n
        s[b] += v
        c[b] += 1
    st, ct = sum(s), n
    out = 0
    for b in range(63):
        if s[b] * ct > st * c[b]:
            out |= 1 << b
    return out


def test_m09_profile_equals_python_brute_force(spark, sf_dir):
    """Independent differential: recompute every grid fingerprint in
    pure Python, brute-force ALL pairs at Hamming <= 6, and pin the
    banded+capped pipeline's per-distance profile equal — the 7-band
    pigeonhole guarantee (recall 1.0 at Hamming <= PHASH_BANDS - 1)
    checked end-to-end through the production machinery."""
    from datalake_worker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fps = {}
    for r in docs:
        fps[r.doc_id] = _py_grid_phash(r.text)
        fps[r.doc_id + 1_000_000] = _py_grid_phash(
            r.text[:3].upper() + r.text[3:]
        )
    fps = {k: v for k, v in fps.items() if v is not None}
    ids = sorted(fps)
    expected: dict[int, int] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 6:
                expected[h] = expected.get(h, 0) + 1
    got = {
        r.hamming: r.n_pairs
        for r in REGISTRY["m09_phash_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_d23_equals_python_union_find(spark, sf_dir):
    """Full independent differential: take d21's admitted pairs, run a
    pure-Python min-label union-find, and pin d23's (cluster_rep, keep)
    map exactly — the transitive-collapse contract checked end-to-end
    against an implementation that shares no code with the pipeline."""
    from datalake_worker_spark.sources import load_table

    pairs = [
        (r.id_a, r.id_b)
        for r in REGISTRY["d21_minhash_audit"].spark_fn(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for a, b in pairs:
        union(a, b)
    docs = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    expected = {d: find(d) for d in docs}
    got = {
        r.doc_id: (r.cluster_rep, r.keep)
        for r in REGISTRY["d23_keeplist_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for d, rep in expected.items():
        assert got[d] == (rep, int(d == rep)), (d, got[d], rep)


def test_d24_equals_python_semdedup(spark, sf_dir):
    """Full independent differential: recompute the sliced cluster
    assignment's within-cluster cosines in numpy and replicate the
    SemDeDup drop rule (drop iff ANY smaller-id in-cluster neighbor
    has cosine >= threshold); pin d24's keep flags exactly."""
    import numpy as np

    from datalake_worker_spark.functions.similarity import to_double_array
    from datalake_worker_spark.operators.wave11 import (
        KM_ITERS,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from datalake_worker_spark.operators.wave14 import (
        D24_SLICE,
        D24_THRESHOLD,
    )
    from datalake_worker_spark.sources import load_table
    import hashlib

    ex = _km_exploded(spark, sf_dir)
    cents = kmeans_train(ex, KM_ITERS)
    assign = {
        r.vec_id: r.cluster
        for r in _km_assign(_km_dists(ex, cents)).collect()
        if hashlib.sha256(str(r.vec_id).encode()).hexdigest()[0] in D24_SLICE
    }
    vecs = {
        r.vec_id: np.array(r.v)
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", to_double_array("embedding").alias("v"))
        .collect()
        if r.vec_id in assign
    }
    expected = {}
    for vid in sorted(assign):
        keep = 1
        v = vecs[vid]
        for other in sorted(assign):
            if other >= vid or assign[other] != assign[vid]:
                continue
            u = vecs[other]
            cos = float(v @ u / (np.linalg.norm(v) * np.linalg.norm(u)))
            # replicate the 6-dp decimal cut before the threshold test
            if float(f"{cos:.6f}") >= D24_THRESHOLD:
                keep = 0
                break
        expected[vid] = (assign[vid], keep)
    got = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in REGISTRY["d24_semdedup_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_m09_replay_pairs_have_small_hamming(spark, sf_dir):
    """The perturbed re-encodes (3 case-flipped chars) must surface as
    near-dup mass at small Hamming distances — the 'same media,
    different encode' case the perceptual family exists for."""
    rows = REGISTRY["m09_phash_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.hamming <= 6 for r in rows)
    assert sum(r.n_pairs for r in rows if r.hamming <= 2) > 0


# ----------------------------------------------------------------- v16
def test_v16_recall_vs_exact_topk(spark, sf_dir):
    """The IVF+PQ audit probes nprobe=2 of 4 cells and shortlists by
    lossy ADC before the exact rerank, so it's approximate by recall
    but DETERMINISTIC by construction; recall@5 vs the exact brute
    force must clear the v04-class floor even on the
    near-unclusterable gaussian corpus."""
    from datalake_worker_spark.functions.similarity import (
        exact_topk,
        to_double_array,
    )
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in exact_topk(e, q, "vec_id", "v", k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["v16_ivfpq_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert len(got & exact) / len(exact) >= 0.35, len(got & exact) / len(exact)


def test_v16_neighbors_live_in_probed_cells(spark, sf_dir):
    """Every returned neighbor must live in one of its query's nprobe
    probed cells — the structural IVF contract the oracle replays."""
    from datalake_worker_spark.operators.wave11 import (
        KM_ITERS,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from datalake_worker_spark.operators.wave14 import V16_NPROBE

    ex = _km_exploded(spark, sf_dir)
    cents = kmeans_train(ex, KM_ITERS)
    assign = {
        r.vec_id: r.cluster for r in _km_assign(_km_dists(ex, cents)).collect()
    }
    rows = REGISTRY["v16_ivfpq_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    cells: dict[int, set] = {}
    for r in rows:
        cells.setdefault(r.query_id, set()).add(assign[r.neighbor_id])
    assert all(len(s) <= V16_NPROBE for s in cells.values())


def test_v16_pq_training_is_deterministic(spark, sf_dir):
    """Two independent PQ training runs must produce BIT-IDENTICAL
    codebooks — the property that lets the unrolled oracle replay the
    trained model at all (partitioning/order cannot leak in through
    the integer-exact 6-dp decimal mean)."""
    from datalake_worker_spark.operators.wave11 import (
        KM_ITERS,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from datalake_worker_spark.operators.wave14 import (
        _v16_init_books,
        _v16_pq_train,
        _v16_residuals,
    )

    ex = _km_exploded(spark, sf_dir)
    cents = kmeans_train(ex, KM_ITERS)
    assign = _km_assign(_km_dists(ex, cents)).select("vec_id", "cluster")
    res = _v16_residuals(ex, cents, assign)
    # different shuffle layout on the second pass: same exact decimals
    b1 = _v16_pq_train(res, _v16_init_books(res, ex))
    b2 = _v16_pq_train(
        res.repartition(7, "vec_id"), _v16_init_books(res, ex)
    )
    assert b1 == b2


def test_v16_every_vector_encodes_all_subspaces(spark, sf_dir):
    """Encoding is total: every corpus vector gets exactly V16_NSUB
    codes, each in [0, V16_CODES)."""
    from datalake_worker_spark.operators.wave11 import (
        KM_ITERS,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )
    from datalake_worker_spark.operators.wave14 import (
        V16_CODES,
        V16_NSUB,
        _v16_init_books,
        _v16_pq_argmin,
        _v16_pq_dists,
        _v16_pq_train,
        _v16_residuals,
    )

    ex = _km_exploded(spark, sf_dir)
    cents = kmeans_train(ex, KM_ITERS)
    assign = _km_assign(_km_dists(ex, cents)).select("vec_id", "cluster")
    res = _v16_residuals(ex, cents, assign)
    books = _v16_pq_train(res, _v16_init_books(res, ex))
    codes = _v16_pq_argmin(_v16_pq_dists(res, books)).collect()
    n_vec = ex.select("vec_id").distinct().count()
    assert len(codes) == n_vec * V16_NSUB
    assert all(0 <= r.code < V16_CODES for r in codes)


# ----------------------------------------------------------------- a20
def test_a20_equals_python_hll(spark, sf_dir):
    """Full independent differential: build the 256-register HLL in
    pure Python (sha-40 bucket/rho, register max, exact integer raw
    estimate, linear-counting branch) per lang AND for the merged ALL
    row, and pin the relational audit's output exactly."""
    import hashlib
    import math

    from datalake_worker_spark.operators.wave14 import (
        A20_M,
        A20_NUM,
        A20_SMALL,
        _A20_ALPHA_DEN,
    )
    from datalake_worker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    regs: dict[str, list[int]] = {}
    toks: dict[str, set] = {}
    for r in docs:
        for t in (r.text.strip().split() if r.text.strip() else []):
            h = int(hashlib.sha256(t.encode()).hexdigest()[:10], 16)
            bucket, w = h >> 32, h & 0xFFFFFFFF
            rho = 33 if w == 0 else 33 - w.bit_length()
            for key in (r.lang, "ALL"):
                m = regs.setdefault(key, [0] * A20_M)
                if rho > m[bucket]:
                    m[bucket] = rho
                toks.setdefault(key, set()).add(t)
    expected = {}
    for key, m in regs.items():
        zint = sum(1 << (33 - mj) for mj in m)
        v = sum(1 for mj in m if mj == 0)
        e_fp = A20_NUM // (_A20_ALPHA_DEN * zint)
        est = (
            float(A20_M) * math.log(float(A20_M) / float(v))
            if (e_fp <= A20_SMALL and v > 0)
            else float(e_fp)
        )
        expected[key] = (len(toks[key]), est, v)
    got = {
        r.lang: (r.exact_distinct, r.hll_estimate, r.empty_buckets)
        for r in REGISTRY["a20_hll_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_a20_error_within_hll_band(spark, sf_dir):
    """The estimate must sit inside a generous multiple of the HLL
    standard error (1.04/sqrt(256) ~ 6.5%) for every group with enough
    mass to be in the raw-estimate regime."""
    rows = REGISTRY["a20_hll_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_distinct >= 1000:
            rel = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
            assert rel < 0.25, (r.lang, r.exact_distinct, r.hll_estimate)


# ----------------------------------------------------------------- t36
def _py_winnow(text: str):
    """Pure-Python Schleimer winnowing replica of t36 (sha-40 gram
    hashes, rightmost-tie window minima, distinct (h, p) set)."""
    import hashlib
    import re

    norm = re.sub(r"[^a-zA-Z0-9 ]", "", text).lower()
    np_ = max(len(norm) - 4, 1)
    hs = []
    for p in range(1, np_ + 1):
        g = norm[p - 1 : p + 4]
        hs.append(int(hashlib.sha256(g.encode()).hexdigest()[:10], 16))
    sel = set()
    for j in range(1, max(np_ - 8 + 1, 1) + 1):
        win = [(hs[p - 1], -p) for p in range(j, min(j + 8, np_ + 1))]
        h, negp = min(win)
        sel.add((h, -negp))
    return sel


def test_t36_equals_python_winnowing(spark, sf_dir):
    """Full independent differential: replicate winnowing per document
    in pure Python and pin (n_fp, min_fp, max_fp, fp_sum) exactly."""
    from datalake_worker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        sel = _py_winnow(r.text)
        hsel = [h for h, _ in sel]
        expected[r.doc_id] = (len(sel), min(hsel), max(hsel), sum(hsel))
    got = {
        r.doc_id: (r.n_fp, r.min_fp, r.max_fp, r.fp_sum)
        for r in REGISTRY["t36_winnow_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_t36_shared_substring_shares_fingerprint(spark, tmp_path):
    """The winnowing guarantee: two documents sharing a substring of
    length >= w + k - 1 (= 12 chars after normalization) must share at
    least one selected fingerprint."""
    shared = "thequickbrownfoxjumpsover"  # 25 normalized chars
    a = "aaaa1111 " + shared + " zzzz2222"
    b = "bbbb3333 " + shared + " yyyy4444"
    spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    fa = _py_winnow(a)
    fb = _py_winnow(b)
    assert {h for h, _ in fa} & {h for h, _ in fb}
    rows = REGISTRY["t36_winnow_audit"].spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 2


# ----------------------------------------------------------------- q28
def test_q28_equals_python_bellman_ford(spark, sf_dir):
    """Independent differential: rebuild the cost graph, run classic
    Bellman-Ford in pure Python, pin the distance map exactly."""
    from datalake_worker_spark.operators.wave14 import (
        Q28_INF,
        Q28_ROUNDS,
        Q28_SOURCE,
        _q28_edges,
    )

    edges = [
        (r.src, r.dst, r.c) for r in _q28_edges(spark, sf_dir).collect()
    ]
    nodes = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    dist = {n: (0 if n == Q28_SOURCE else Q28_INF) for n in nodes}
    for _ in range(Q28_ROUNDS):
        nxt = dict(dist)
        for u, v, c in edges:
            if dist[u] < Q28_INF and dist[u] + c < nxt[v]:
                nxt[v] = dist[u] + c
        dist = nxt
    expected = {n: d for n, d in dist.items() if d < Q28_INF}
    got = {
        r.nationkey: r.cost_fp
        for r in REGISTRY["q28_sssp_bellman_ford"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_q28_broadcast_bit_equals_literal_path(spark, sf_dir):
    """The web-scale broadcast-frame SSSP must be BIT-EQUAL to the
    registered literal path on the same graph, and safe on empty."""
    from datalake_worker_spark.operators.wave14 import (
        _q28_edges,
        q28_sssp_bellman_ford,
        sssp_broadcast,
    )

    lit = sorted(
        map(tuple, q28_sssp_bellman_ford(spark, sf_dir).collect())
    )
    bc = sorted(
        map(tuple, sssp_broadcast(spark, _q28_edges(spark, sf_dir)).collect())
    )
    assert lit == bc
    empty = spark.createDataFrame([], "src long, dst long, c long")
    assert sssp_broadcast(spark, empty).count() == 0


# ----------------------------------------------------------------- w20
def test_w20_interpolation_math(spark, tmp_path):
    """Planted timeline: user 1 observes value 10.0 at hour 0 and 20.0
    at hour 4 — hours 1..3 must interpolate to 12.5/15.0/17.5 exactly,
    endpoints marked obs."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, 10.0, "click", "{}"),
        (2, 1, base + datetime.timedelta(hours=4), 20.0, "click", "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.user_id, r.h.hour): (r.value, r.src)
        for r in REGISTRY["w20_linear_interpolation"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        (1, 0): (10.0, "obs"),
        (1, 1): (12.5, "interp"),
        (1, 2): (15.0, "interp"),
        (1, 3): (17.5, "interp"),
        (1, 4): (20.0, "obs"),
    }


def test_w20_grid_is_dense_and_bounded(spark, sf_dir):
    """Every user's output covers exactly its min..max observed hours,
    one row per hour, observations marked obs."""
    rows = REGISTRY["w20_linear_interpolation"].spark_fn(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        hours = sorted(r.h for r in rs)
        span = int((hours[-1] - hours[0]).total_seconds() // 3600) + 1
        assert len(rs) == span, (uid, len(rs), span)
        assert rs[0].src is not None


# ----------------------------------------------------------------- q29
def test_q29_equals_python_peel_and_reaches_fixpoint(spark, sf_dir):
    """Independent differential: symmetrize the trade graph, peel in
    pure Python to the k-core FIXPOINT, and pin the surviving set +
    within-core degrees exactly — also proving the registered fixed
    round count reaches the fixpoint on this corpus."""
    from datalake_worker_spark.operators.wave14 import Q29_K, Q29_ROUNDS
    from datalake_worker_spark.sources import load_table
    from pyspark.sql import functions as F2

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = {
        (r.src, r.dst)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .select(
            F2.col("c_nationkey").alias("src"), F2.col("s_nationkey").alias("dst")
        )
        .distinct()
        .collect()
        if r.src != r.dst
    }
    adj: dict[int, set] = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    rounds = 0
    while True:
        deg = {n: len(adj[n] & alive) for n in alive}
        nxt = {n for n in alive if deg[n] >= Q29_K}
        rounds += 1
        if nxt == alive:
            break
        alive = nxt
    assert rounds <= Q29_ROUNDS, f"fixpoint needs {rounds} > {Q29_ROUNDS} rounds"
    expected = {n: len(adj[n] & alive) for n in alive}
    got = {
        r.nationkey: r.core_degree
        for r in REGISTRY["q29_kcore"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


# ----------------------------------------------------------------- t37
def test_t37_equals_python_kneser_ney(spark, tmp_path):
    """Planted corpus: compute interpolated KN by hand in Python and
    pin per-doc (n_bigrams, total_nll, avg_nll) exactly (9-dp term
    cut replicated)."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    docs = [
        (1, "a b a b c"),
        (2, "a b c d"),
        (3, "d a d a"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    bigrams = []
    for i, t in docs:
        w = t.split()
        bigrams += [(i, w[j], w[j + 1]) for j in range(len(w) - 1)]
    from collections import Counter

    c2 = Counter((a, b) for _, a, b in bigrams)
    c1 = Counter()
    nf = Counter()
    nb = Counter()
    for (a, b), n in c2.items():
        c1[a] += n
        nf[a] += 1
        nb[b] += 1
    nt = len(c2)
    D = 0.75
    expected = {}
    for i, _ in docs:
        terms = []
        for _, a, b in [x for x in bigrams if x[0] == i]:
            p = max(c2[(a, b)] - D, 0.0) / c1[a] + (D * nf[a] / c1[a]) * (
                nb[b] / nt
            )
            nll = Decimal(repr(-math.log(p))).quantize(
                Decimal("0.000000001"), rounding=ROUND_HALF_UP
            )
            terms.append(nll)
        tot = sum(terms)
        expected[i] = (len(terms), float(tot), float(tot) / len(terms))
    got = {
        r.doc_id: (r.n_bigrams, r.total_nll, r.avg_nll)
        for r in REGISTRY["t37_kneser_ney_logprob"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert got == expected


def test_t37_probability_mass_sums_to_one(spark, sf_dir):
    """The defining KN property: for every context w1, the discounted
    mass plus the redistributed continuation mass sums to EXACTLY 1
    over the observed bigram-type vocabulary (within float eps) —
    absolute discounting frees D*N1+(w1.) of mass and the backoff
    returns all of it."""
    from datalake_worker_spark.sources import load_table
    from datalake_worker_spark.functions.text import whitespace_tokens
    from collections import Counter

    d = load_table(spark, sf_dir, "documents").select("text").limit(100)
    c2 = Counter()
    for r in d.collect():
        w = r.text.strip().split()
        for j in range(len(w) - 1):
            c2[(w[j], w[j + 1])] += 1
    c1 = Counter()
    nf = Counter()
    nb = Counter()
    for (a, b), n in c2.items():
        c1[a] += n
        nf[a] += 1
        nb[b] += 1
    nt = len(c2)
    D = 0.75
    vocab_w2 = list(nb)
    for a in list(c1)[:20]:
        mass = sum(
            max(c2.get((a, b), 0) - D, 0.0) / c1[a]
            + (D * nf[a] / c1[a]) * (nb[b] / nt)
            for b in vocab_w2
        )
        assert abs(mass - 1.0) < 1e-9, (a, mass)


def test_kcore_broadcast_bit_equals_literal_path(spark, sf_dir):
    """The web-scale broadcast-frame peel must be BIT-EQUAL to the
    registered literal path on the same graph, and safe on empty."""
    from datalake_worker_spark.operators.wave14 import (
        kcore_broadcast,
        q29_kcore,
    )
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = raw.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        raw.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    lit = sorted(map(tuple, q29_kcore(spark, sf_dir).collect()))
    bc = sorted(map(tuple, kcore_broadcast(spark, sym).collect()))
    assert lit == bc
    empty = spark.createDataFrame([], "a long, b long")
    assert kcore_broadcast(spark, empty).count() == 0


# ----------------------------------------------------------------- d25
def test_d25_planted_near_subset(spark, tmp_path):
    """A document fully contained in a longer one must surface with
    containment 1.0 in the subset direction — the asymmetric case
    symmetric Jaccard under-scores."""
    base = " ".join(f"tok{i}" for i in range(30))
    longer = base + " extraA extraB extraC"
    spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, longer, "en", "s", len(longer))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = REGISTRY["d25_containment_audit"].spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # every shingle of the short doc appears in the long one
    assert r.containment_ab == 1.0
    assert r.containment_ba < 1.0


def test_d25_agrees_with_python_containment(spark, sf_dir):
    """For every admitted pair, recompute exact distinct-shingle
    containment in Python and pin both directions (6-dp cut)."""
    from datalake_worker_spark.sources import load_table

    def shingles(text):
        w = text.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    docs = {
        r.doc_id: shingles(r.text)
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = REGISTRY["d25_containment_audit"].spark_fn(spark, sf_dir).collect()
    for r in rows:
        inter = len(docs[r.id_a] & docs[r.id_b])
        assert r.n_common == inter
        assert abs(r.containment_ab - inter / len(docs[r.id_a])) < 1e-6
        assert abs(r.containment_ba - inter / len(docs[r.id_b])) < 1e-6
        assert max(r.containment_ab, r.containment_ba) >= 0.8
