"""Round-12 operators: d20 SimHash audit, a19 CMS audit, t34 binned
stump, q26's broadcast-rank path."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


def _py_sha40(tok: str) -> int:
    return int(hashlib.sha256(tok.encode()).hexdigest()[:10], 16)


def _py_simhash40(text: str) -> int:
    toks = text.strip().split() if text.strip() else [""]
    out = 0
    for b in range(40):
        vote = sum(
            1 if (_py_sha40(t) >> b) & 1 else -1 for t in toks
        )
        if vote > 0:
            out |= 1 << b
    return out


# ----------------------------------------------------------------- d20
def test_d20_equals_python_brute_force(spark, sf_dir):
    """Independent differential: recompute every sha-40 fingerprint in
    pure Python, brute-force ALL pairs at Hamming <= 3, and pin the
    blocked+capped pipeline equal — the pigeonhole guarantee (recall
    1.0 at the advertised radius) checked end-to-end, not assumed."""
    from datalake_worker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fps = {r.doc_id: _py_simhash40(r.text) for r in docs}
    ids = sorted(fps)
    expect = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in REGISTRY["d20_simhash_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0


def test_d20_shares_production_machinery():
    """The audit must be the SAME code path d05/d08 run (one fold, one
    banding, one capped join) — pin the call graph, not a copy."""
    import inspect

    from datalake_worker_spark.operators import wave13

    src = inspect.getsource(wave13.d20_simhash_audit)
    for shared in (
        "simhash_from_token_hashes",
        "pigeonhole_bands",
        "capped_fingerprint_band_pairs",
    ):
        assert shared in src, shared


# ----------------------------------------------------------------- d21
def test_d21_planted_near_dups(spark, tmp_path):
    """A pair sharing most shingles is admitted with the exact Jaccard;
    an unrelated doc never appears; short docs (< 3 words) fall back to
    the whole-text shingle and exact copies score 1.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        dict(doc_id=0, text=base),
        dict(doc_id=1, text=base + " tail"),        # near-dup of 0
        dict(doc_id=2, text="completely different words here entirely"),
        dict(doc_id=3, text="tiny doc"),             # < 3 words
        dict(doc_id=4, text="tiny doc"),             # exact copy of 3
    ]
    pq.write_table(
        pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet")
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in REGISTRY["d21_minhash_audit"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in rows
    # doc0 has 10 shingles, doc1 has 11, sharing 10 → jaccard 10/11
    assert abs(rows[(0, 1)].jaccard - round(10 / 11, 6)) < 1e-9
    assert rows[(3, 4)].jaccard == 1.0
    assert all(2 not in pair for pair in rows)


def test_d21_jaccard_matches_python(spark, sf_dir):
    """Every admitted pair's Jaccard equals the exact distinct-shingle
    Jaccard recomputed in Python (the verify stage is exact; the LSH
    blocking only gates which pairs are CONSIDERED)."""
    from datalake_worker_spark.functions.dedup import shingles_from_words
    from datalake_worker_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = {
        r.doc_id: set(r.s)
        for r in d.select(
            "doc_id",
            shingles_from_words(F.split(F.col("text"), " ")).alias("s"),
        ).collect()
    }
    rows = REGISTRY["d21_minhash_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = sh[r.id_a], sh[r.id_b]
        jac = len(a & b) / len(a | b)
        assert jac >= 0.5
        assert abs(r.jaccard - round(jac, 6)) < 1e-9
        assert r.n_common == len(a & b)


# ----------------------------------------------------------------- q27
def test_q27_python_reference(spark, sf_dir):
    """Bit-identical to a pure-Python synchronous LPA over the
    collected edge list (the q26 differential discipline)."""
    from datalake_worker_spark.operators.wave13 import Q27_ITERS
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ew = [
        (int(r.src), int(r.dst), int(r.w))
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cu, o.o_custkey == cu.c_custkey)
            .join(su, li.l_suppkey == su.s_suppkey)
            .groupBy(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("w"))
            .collect()
        )
    ]
    nodes = sorted({s for s, _, _ in ew} | {d for _, d, _ in ew})
    lbl = {n: n for n in nodes}
    for _ in range(Q27_ITERS):
        votes: dict[int, dict[int, int]] = {}
        for s, d, w in ew:
            votes.setdefault(d, {})
            votes[d][lbl[s]] = votes[d].get(lbl[s], 0) + w
        lbl = {
            n: (
                min(
                    (l for l, wv in votes[n].items()
                     if wv == max(votes[n].values()))
                )
                if n in votes
                else lbl[n]
            )
            for n in nodes
        }
    sizes: dict[int, int] = {}
    for v in lbl.values():
        sizes[v] = sizes.get(v, 0) + 1
    got = {
        r.nationkey: (r.community, r.community_size)
        for r in REGISTRY["q27_label_propagation"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {n: (lbl[n], sizes[lbl[n]]) for n in nodes}


def test_q27_planted_two_communities(spark, tmp_path):
    """Two dense cliques bridged by a weak edge must settle into two
    communities (the LPA contract on separable structure)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Two blocks {0,1} and {2,3} with ASYMMETRIC in-block weights (the
    # low-id node dominates both self- and cross-votes) so synchronous
    # LPA converges to one label per block instead of the bipartite
    # label oscillation symmetric weights produce (the known sync-LPA
    # property; Raghavan et al. §3 recommend async updates for it).
    # One weak bridge 1->2 must not merge the blocks.
    edges = (
        [(0, 0)] * 100 + [(0, 1)] * 100 + [(1, 0)] * 10 + [(1, 1)] * 30
        + [(2, 2)] * 100 + [(2, 3)] * 100 + [(3, 2)] * 10 + [(3, 3)] * 30
        + [(1, 2)] * 1
    )
    cust, supp, orders, lines = [], [], [], []
    for i, (cn, sn) in enumerate(edges):
        cust.append(dict(c_custkey=i, c_nationkey=cn))
        supp.append(dict(s_suppkey=i, s_nationkey=sn))
        orders.append(dict(o_orderkey=i, o_custkey=i))
        lines.append(dict(l_orderkey=i, l_suppkey=i))
    for name, rows in (
        ("customer", cust), ("supplier", supp),
        ("orders", orders), ("lineitem", lines),
    ):
        pq.write_table(
            pa.Table.from_pylist(rows), str(tmp_path / f"{name}.parquet")
        )
    got = {
        r.nationkey: r.community
        for r in REGISTRY["q27_label_propagation"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert got[0] == got[1] and got[2] == got[3]
    assert got[0] != got[2]


def test_q27_broadcast_bit_equals_literal_path(spark, sf_dir):
    """The web-scale broadcast-label round must be bit-identical to the
    registered literal-CASE path on the nation graph (the
    pagerank_broadcast pattern applied to LPA)."""
    from datalake_worker_spark.operators.wave13 import (
        label_propagation_broadcast,
    )
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    lit_rows = sorted(
        map(
            tuple,
            REGISTRY["q27_label_propagation"].spark_fn(spark, sf_dir).collect(),
        )
    )
    bc_rows = sorted(
        map(tuple, label_propagation_broadcast(spark, edges).collect())
    )
    assert bc_rows == lit_rows and len(bc_rows) > 0


def test_pigeonhole_bands_complete_at_any_radius(spark):
    """Property (hypothesis): for random fingerprints, any n_bits and
    n_bands, EVERY pair within Hamming distance < n_bands shares at
    least one band — the guarantee d08/d20 rely on."""
    import random

    from datalake_worker_spark.functions.dedup import pigeonhole_bands

    rng = random.Random(13)
    for n_bits, n_bands in ((40, 4), (64, 9), (48, 5), (32, 3)):
        base = rng.getrandbits(n_bits - 1)
        rows = [(0, base)]
        # plant neighbors at every distance 1..n_bands-1 (flip distinct bits)
        for d in range(1, n_bands):
            fp = base
            for b in rng.sample(range(n_bits - 1), d):
                fp ^= 1 << b
            rows.append((d, fp))
        df = spark.createDataFrame(rows, "doc_id long, fp long")
        banded = pigeonhole_bands(df, "doc_id", "fp", n_bits, n_bands).collect()
        bands = {}
        for r in banded:
            bands.setdefault(r.doc_id, set()).add((r.band_idx, r.band_val))
        for d in range(1, n_bands):
            assert bands[0] & bands[d], (n_bits, n_bands, d)


# ----------------------------------------------------------------- t35
def test_t35_bm25_semantics(spark, tmp_path):
    """BM25 invariants on a planted corpus: more query-term mass in a
    shorter doc ranks higher; a doc with zero query terms never
    appears; the rarer term contributes a larger idf (a one-rare-term
    doc outranks a one-common-term doc of equal length)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    filler = " ".join(["filler"] * 20)
    docs = [
        dict(doc_id=0, text="join join join hash"),          # dense, short
        dict(doc_id=1, text="join " + filler),               # one common hit, long
        dict(doc_id=2, text="spark " + filler),              # one rare hit, long
        dict(doc_id=3, text=filler),                         # no hits
        # 'join' appears in 3 docs, 'spark' in 2 → spark is rarer
        dict(doc_id=4, text="join spark " + filler),
    ]
    pq.write_table(
        pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in REGISTRY["t35_bm25_search"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert 3 not in rows
    assert rows[0].rn == 1                       # densest, shortest
    assert rows[2].bm25 > rows[1].bm25           # rarer term > common term
    assert rows[4].bm25 > rows[2].bm25           # two terms > one


def test_t35_matches_python_reference(spark, sf_dir):
    """Scores equal a pure-Python BM25 over the same tokenization,
    with the same 9-dp decimal per-term cut and 6-dp final round."""
    from decimal import Decimal, ROUND_HALF_UP
    import math

    from datalake_worker_spark.operators.wave13 import (
        T35_B,
        T35_K1,
        T35_TERMS,
        T35_TOPK,
    )
    from datalake_worker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.strip().split() for r in docs}
    n = len(toks)
    sdl = sum(len(t) for t in toks.values())
    avgdl = sdl / n
    df = {
        t: sum(1 for d in toks.values() if t in d) for t in T35_TERMS
    }
    scores = {}
    for did, t in toks.items():
        s = Decimal(0)
        for term in T35_TERMS:
            tf = t.count(term)
            if tf == 0 or df[term] == 0:
                continue
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            v = idf * (tf * (T35_K1 + 1.0)) / (
                tf + T35_K1 * (1.0 - T35_B + T35_B * len(t) / avgdl)
            )
            s += Decimal(repr(v)).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP
            )
        if s:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:T35_TOPK]
    got = REGISTRY["t35_bm25_search"].spark_fn(spark, sf_dir).collect()
    assert [(r.doc_id, r.rn) for r in sorted(got, key=lambda r: r.rn)] == [
        (d, i + 1) for i, (d, _) in enumerate(want)
    ]
    for r in got:
        exp = float(
            scores[r.doc_id].quantize(
                Decimal("1.000000"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(r.bm25 - exp) < 1e-12, (r.doc_id, r.bm25, exp)


# ----------------------------------------------------------------- v15
def test_v15_recall_vs_exact_topk(spark, sf_dir):
    """The IVF audit probes nprobe=2 of 4 v13-trained cells, so it's
    approximate by recall but DETERMINISTIC by construction; recall@5
    vs the exact brute force must clear the v04-class floor even on
    the near-unclusterable gaussian corpus."""
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
        for r in REGISTRY["v15_ivf_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert len(got & exact) / len(exact) >= 0.4, len(got & exact) / len(exact)


def test_v15_probes_exactly_nprobe_cells(spark, sf_dir):
    """Every returned neighbor must live in one of its query's nprobe
    probed cells — the structural IVF contract the oracle replays."""
    from datalake_worker_spark.operators.wave11 import (
        KM_ITERS,
        _km_assign,
        _km_dists,
        _km_exploded,
        kmeans_train,
    )

    ex = _km_exploded(spark, sf_dir)
    cents = kmeans_train(ex, KM_ITERS)
    assign = {
        r.vec_id: r.cluster for r in _km_assign(_km_dists(ex, cents)).collect()
    }
    rows = REGISTRY["v15_ivf_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    # group neighbors per query; each query's neighbor cells form a set
    # of size <= nprobe
    cells: dict[int, set] = {}
    for r in rows:
        cells.setdefault(r.query_id, set()).add(assign[r.neighbor_id])
    assert all(len(s) <= 2 for s in cells.values())


# ----------------------------------------------------------------- d22
def test_d22_zero_false_negatives_vs_exact_join(spark, sf_dir):
    """Bloom admission can overcount (FPR > 0) but NEVER undercount:
    every document the exact distinct-gram join flags must appear in
    d22 with n_candidate >= the exact match count — the same contract
    d14's property test pins for the xxhash family, here for the sha
    audit family."""
    from datalake_worker_spark.functions.pipeline import ngram_decontaminate
    from datalake_worker_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    exact = {
        r.doc_id: r.n_matched
        for r in ngram_decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    }
    got = {
        r.doc_id: r.n_candidate
        for r in REGISTRY["d22_bloom_audit"].spark_fn(spark, sf_dir).collect()
    }
    assert exact, "fixture must contain contaminated documents"
    for doc_id, n_matched in exact.items():
        assert doc_id in got and got[doc_id] >= n_matched, doc_id
    # candidate inflation stays bounded (FPR ~0.8% at these parameters)
    assert len(got) <= 2 * len(exact) + 20


# ----------------------------------------------------------------- a19
def test_a19_estimates_never_undercount(spark, sf_dir):
    """CMS guarantee: est >= exact for every probed token, and the
    top-20 ranking is (exact desc, token asc)."""
    rows = REGISTRY["a19_cms_audit"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.cms_n >= r.exact_n for r in rows)
    assert all(r.over == r.cms_n - r.exact_n for r in rows)
    ordered = sorted(rows, key=lambda r: (-r.exact_n, r.tok))
    assert [r.rn for r in ordered] == list(range(1, 21))


def test_a19_planted_collision_overcounts(spark, tmp_path):
    """Force a width-1 sketch: every token lands in the same cell, so
    the estimate for each token must equal the TOTAL token count —
    the audit's arithmetic is the real CMS, not a pass-through."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalake_worker_spark.operators import wave13

    docs = [
        dict(doc_id=0, text="aa aa aa bb"),
        dict(doc_id=1, text="bb cc"),
    ]
    pq.write_table(
        pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet")
    )
    orig = wave13.A19_WIDTH
    wave13.A19_WIDTH = 1
    try:
        rows = wave13.a19_cms_audit(spark, str(tmp_path)).collect()
    finally:
        wave13.A19_WIDTH = orig
    assert {r.tok: r.cms_n for r in rows} == {"aa": 6, "bb": 6, "cc": 6}
    assert {r.tok: r.exact_n for r in rows} == {"aa": 3, "bb": 2, "cc": 1}


# ----------------------------------------------------------------- t34
def test_t34_matches_t33_on_separable_data(spark, tmp_path):
    """Planted separable corpus: label ('spark' in text) is perfectly
    separated by document length. The binned search must agree with the
    exact search on the winning feature AND reach the same pure-split
    score SCALE * n (Gini impurity 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalake_worker_spark.operators.wave12 import T33_SCALE

    docs = []
    for i in range(120):
        if i % 2:
            text = "spark " * 3  # short, positive
        else:
            text = "plain words only " * 40  # long, negative
        docs.append(dict(doc_id=i, text=text.strip(), n_chars=len(text.strip())))
    pq.write_table(
        pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet")
    )
    exact = REGISTRY["t33_decision_stump"].spark_fn(spark, str(tmp_path)).collect()
    binned = REGISTRY["t34_binned_stump"].spark_fn(spark, str(tmp_path)).collect()
    assert exact[0].feature == binned[0].feature
    assert int(exact[0].score_fp) == int(binned[0].score_fp) == T33_SCALE * 120
    # pure split → binned predictions are perfect too
    assert all(r.predicted == r.label for r in binned)


def test_t34_thresholds_are_order_statistics(spark, sf_dir):
    """The chosen binned threshold must be one of the 15 interior
    rank-ceil(i*n/16) order statistics of its feature — the contract
    that makes the oracle's relational boundary derivation exact."""
    from datalake_worker_spark.operators.wave12 import _t33_features
    from datalake_worker_spark.operators.wave13 import T34_BINS
    from datalake_worker_spark.sources import load_table

    rows = REGISTRY["t34_binned_stump"].spark_fn(spark, sf_dir).collect()
    fname, thr = rows[0].feature, int(rows[0].threshold)
    vals = sorted(
        int(getattr(r, fname))
        for r in _t33_features(load_table(spark, sf_dir, "documents")).collect()
    )
    n = len(vals)
    bounds = {
        vals[(i * n + T34_BINS - 1) // T34_BINS - 1] for i in range(1, T34_BINS)
    }
    assert thr in bounds


# ----------------------------------------------------------------- q26
def test_pagerank_broadcast_bit_equals_literal_path(spark, sf_dir):
    """VERDICT r11 item 5: the web-scale broadcast-rank round must be
    bit-identical to the registered literal-CASE path on the nation
    graph (same fixed-point arithmetic, rank vector as a frame)."""
    from datalake_worker_spark.operators.wave12 import pagerank_broadcast
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    lit_rows = sorted(
        map(tuple, REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir).collect())
    )
    bc_rows = sorted(map(tuple, pagerank_broadcast(spark, edges).collect()))
    assert bc_rows == lit_rows and len(bc_rows) > 0


def test_pagerank_broadcast_empty_graph(spark):
    from datalake_worker_spark.operators.wave12 import pagerank_broadcast

    edges = spark.createDataFrame([], "src long, dst long, w long")
    assert pagerank_broadcast(spark, edges).collect() == []
