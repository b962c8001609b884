"""Property tests for the round-4 late operators: MERGE upsert
invariants, URL-canonicalization idempotence, weighted-sampling bias,
and the content fingerprint's order independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.sources import load_table

_load_all()


def test_merge_upsert_row_accounting(spark, sf_dir):
    """|merged| = |target| - |deletes| + |inserts|; updates rewrite in
    place; deleted keys are gone; inserted keys are present."""
    t = load_table(spark, sf_dir, "orders")
    n_target = t.count()
    n_del = t.filter(F.col("o_orderkey") % 31 == 0).count()
    n_ins = t.filter(F.col("o_orderkey") % 97 == 0).count()
    merged = REGISTRY["io08_merge_upsert"].spark_fn(spark, sf_dir)
    assert merged.count() == n_target - n_del + n_ins
    assert merged.filter(F.col("o_orderkey") % 31 == 0).filter(
        F.col("o_orderkey") < 10000000
    ).count() == 0
    assert merged.filter(F.col("o_orderkey") >= 10000000).count() == n_ins
    # every updated row carries the rewritten status
    upd = merged.filter(
        (F.col("o_orderkey") < 10000000)
        & (F.col("o_orderkey") % 31 != 0)
        & (F.col("o_orderkey") % 7 == 0)
    )
    assert upd.filter(F.col("o_orderstatus") != "U").count() == 0


def test_url_canonicalization_idempotent(spark, sf_dir):
    """canonicalize(canonicalize(u)) == canonicalize(u) — a canonical
    form must be a fixed point, else dedup keys drift across passes."""
    from datalake_worker_spark.functions.dedup import _RAW_URL_SQL, canonicalize_url

    d = load_table(spark, sf_dir, "documents").select(
        F.expr(_RAW_URL_SQL).alias("raw")
    )
    once = d.select(canonicalize_url(F.col("raw")).alias("u1"))
    twice = once.select(
        "u1", canonicalize_url(F.col("u1")).alias("u2")
    )
    assert twice.filter(F.col("u1") != F.col("u2")).count() == 0


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """The Efraimidis-Spirakis sample's mean weight must exceed the
    corpus mean weight (heavier docs are proportionally likelier)."""
    sample = REGISTRY["smp07_weighted_sample"].spark_fn(spark, sf_dir)
    corpus = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    mean_sample = sample.agg(F.avg("n_chars")).first()[0]
    mean_corpus = corpus.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_corpus


def test_weighted_sample_deterministic(spark, sf_dir):
    a = sorted(
        r.doc_id
        for r in REGISTRY["smp07_weighted_sample"].spark_fn(spark, sf_dir).collect()
    )
    b = sorted(
        r.doc_id
        for r in REGISTRY["smp07_weighted_sample"].spark_fn(spark, sf_dir).collect()
    )
    assert a == b and len(a) == 100


def test_content_fingerprint_partition_invariant(spark, sf_dir):
    """The digest is a commutative sum: any repartitioning/ordering of
    the input yields the identical fingerprint."""
    base = {
        (r.o_orderstatus, r.n_rows, r.fingerprint)
        for r in REGISTRY["a13_content_fingerprint"].spark_fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").repartition(7, "o_orderpriority")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    v = F.conv(F.substring(F.sha2(canon, 256), 1, 10), 16, 10).cast("long")
    alt = {
        (r.o_orderstatus, r.n_rows, r.fingerprint)
        for r in o.select(F.col("o_orderstatus"), v.alias("v"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"), F.sum("v").cast("long").alias("fingerprint"))
        .collect()
    }
    assert base == alt


def test_nfc_normalize_collapses_decomposed(spark, sf_dir):
    """Docs planted with the decomposed suffix (doc_id % 3 == 1) must
    collapse by exactly one code unit; precomposed and plain docs are
    already NFC."""
    out = REGISTRY["t16_unicode_normalize"].spark_fn(spark, sf_dir)
    bad = out.filter(
        (
            (F.col("doc_id") % 3 == 1) & (F.col("n_collapsed") != 1)
        )
        | ((F.col("doc_id") % 3 != 1) & (F.col("n_collapsed") != 0))
    )
    assert bad.count() == 0


def _mk_target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, tag string, val double",
    )


def _mk_changes(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, op string, new_tag string, new_val double"
    )


def test_merge_upsert_empty_changes_is_identity(spark):
    from datalake_worker_spark.sources.roundtrip import merge_upsert

    t = _mk_target(spark)
    out = merge_upsert(
        t, _mk_changes(spark, []), "id", {"tag": "new_tag", "val": "new_val"}
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, t.collect()))


def test_merge_upsert_all_ops(spark):
    from datalake_worker_spark.sources.roundtrip import merge_upsert

    t = _mk_target(spark)
    chg = _mk_changes(
        spark,
        [
            (1, "D", None, None),
            (2, "U", "B", 200.0),
            (9, "I", "z", 90.0),
        ],
    )
    out = merge_upsert(t, chg, "id", {"tag": "new_tag", "val": "new_val"})
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(2, "B", 200.0), (3, "c", 30.0), (9, "z", 90.0)]


def test_merge_upsert_delete_everything(spark):
    from datalake_worker_spark.sources.roundtrip import merge_upsert

    t = _mk_target(spark)
    chg = _mk_changes(spark, [(1, "D", None, None), (2, "D", None, None), (3, "D", None, None)])
    out = merge_upsert(t, chg, "id", {"tag": "new_tag", "val": "new_val"})
    assert out.count() == 0


def test_near_dup_keep_list_transitive_collapse(spark):
    """A~B and B~C (each pair over threshold) but A~C below it: the
    keep-list must still collapse the whole chain to one survivor —
    that's what the connected-components stage buys over pairwise
    dropping."""
    from datalake_worker_spark.functions.dedup import near_dup_pairs_minhash
    from datalake_worker_spark.functions.graph import connected_components

    base = [f"w{i}" for i in range(30)]
    b = list(base); b[0], b[1] = "x0", "x1"
    c = list(b); c[2], c[3] = "y2", "y3"
    rows = [
        (1, " ".join(base)),
        (2, " ".join(b)),
        (3, " ".join(c)),
        (4, " ".join(f"z{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    comp = connected_components(pairs, "id_a", "id_b")
    labels = {r.node: r.component for r in comp.collect()}
    # the chain 1-2-3 is one component rooted at 1; 4 is untouched
    assert labels.get(1, 1) == 1 and labels[2] == 1 and labels[3] == 1
    assert 4 not in labels


def test_bloom_decontamination_no_false_negatives(spark, sf_dir):
    """Every document the exact gram join (d09) flags must also be a
    bloom candidate (zero false negatives — the bloom guarantee), with
    its candidate gram count >= the exact match count; and the bloom
    pass must not balloon (candidates bounded by a small multiple of
    the exact set at this FPR)."""
    exact = {
        r["doc_id"]: r["n_matched"]
        for r in REGISTRY["d09_benchmark_decontamination"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    bloom = {
        r["doc_id"]: r["n_candidate"]
        for r in REGISTRY["d14_bloom_decontamination"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    for doc_id, n_exact in exact.items():
        assert doc_id in bloom, f"false negative: doc {doc_id}"
        assert bloom[doc_id] >= n_exact
    # FPR sanity: at 2^20 bits / k=7 over a tiny vocabulary, spurious
    # candidate docs should be rare
    assert len(bloom) <= max(10, 3 * len(exact))


def test_document_chunking_reconstructs_and_overlaps(spark, sf_dir):
    """Chunking invariants: every chunk except the last has exactly 40
    words; consecutive chunks overlap by 10 (stride 30); the chunk-0
    prefix equals the document prefix; short docs yield one chunk."""
    out = (
        REGISTRY["t18_document_chunking"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    d = load_table(spark, sf_dir, "documents")
    words = {
        r["doc_id"]: r["text"].split()
        for r in d.select("doc_id", "text").collect()
    }
    for doc_id, chunks in by_doc.items():
        w = words[doc_id]
        assert sorted(chunks) == list(range(len(chunks)))
        for cid, r in chunks.items():
            got = r["chunk"].split()
            assert got == w[cid * 30 : cid * 30 + 40]
        last = chunks[len(chunks) - 1]
        # the last chunk reaches the end of the document
        assert (len(chunks) - 1) * 30 + last["n_words"] == len(w)
