"""Dedup operator properties (SURVEY.md §5.5): MinHash recall on planted
near-duplicates, SimHash locality, blocking completeness vs brute force."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.functions.dedup import (
    exact_jaccard,
    hamming64,
    near_dup_pairs_minhash,
    simhash64,
)

VOCAB = (
    "spark data query join filter window agg scan merge sort hash table row "
    "column stream batch fast slow big small key value group order part line"
).split()


def _corpus(spark, n_base=60, n_dups=20, seed=7):
    """Base docs + planted near-dups (1-2 word edits of a base doc)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        words = [rng.choice(VOCAB) for _ in range(30)]
        rows.append((i, " ".join(words)))
    dup_pairs = []
    for j in range(n_dups):
        base_id, base_text = rows[rng.randrange(n_base)]
        words = base_text.split()
        for _ in range(rng.randint(1, 2)):  # tiny edit → jaccard stays high
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        new_id = n_base + j
        rows.append((new_id, " ".join(words)))
        dup_pairs.append((base_id, new_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, dup_pairs


def test_minhash_recall_on_planted_dups(spark):
    df, planted = _corpus(spark)
    found = near_dup_pairs_minhash(df, "doc_id", "text", k=64, bands=16, threshold=0.5)
    got = {(min(a, b), max(a, b)) for a, b in ((r.id_a, r.id_b) for r in found.collect())}
    # compute which planted pairs actually have jaccard >= 0.5 (ground truth)
    toks = df.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )
    a = toks.select(F.col("doc_id").alias("ia"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("ib"), F.col("t").alias("tb"))
    truth = {
        (min(r.ia, r.ib), max(r.ia, r.ib))
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .withColumn("j", exact_jaccard(F.col("ta"), F.col("tb")))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    planted_true = {(min(a_, b_), max(a_, b_)) for a_, b_ in planted} & truth
    assert planted_true, "corpus generation produced no true dups?"
    recall = len(got & planted_true) / len(planted_true)
    assert recall >= 0.9, f"recall {recall}: {planted_true - got}"
    # no false positives: every reported pair really has jaccard >= 0.5
    assert got <= truth


def test_minhash_verification_is_exact(spark, oracle):
    """Candidate verification recomputes the exact jaccard of the SAME
    set family the minhash estimates — distinct word-3-gram shingles
    (r7: the pre-r7 token-set verify was a different, far more
    permissive measure than the estimator's)."""

    def shingles(text: str, n: int = 3) -> set[str]:
        w = text.split(" ")
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    df, _ = _corpus(spark, n_base=30, n_dups=10)
    texts = {r.doc_id: r.text for r in df.collect()}
    pairs = near_dup_pairs_minhash(df, "doc_id", "text", threshold=0.3).collect()
    assert pairs, "no candidate pairs to verify"
    for r in pairs:
        sa, sb = shingles(texts[r.id_a]), shingles(texts[r.id_b])
        exact = len(sa & sb) / len(sa | sb)
        assert abs(r.jaccard - round(exact, 6)) < 1e-9
        assert r.jaccard >= 0.3


def test_simhash_locality(spark):
    """Near-identical docs get close simhashes; unrelated docs don't."""
    df, planted = _corpus(spark, n_base=40, n_dups=10)
    sh = {r.doc_id: r.sh for r in df.select("doc_id", simhash64("text").alias("sh")).collect()}
    near = [
        bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") for a, b in planted
    ]
    rng = random.Random(1)
    far_pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
    far = [
        bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        for a, b in far_pairs
        if a != b
    ]
    assert sum(near) / len(near) < sum(far) / len(far) - 5, (near, far)


def test_simhash_banded_pairs_find_planted_dups(spark):
    from datalake_worker_spark.functions.dedup import near_dup_pairs_simhash

    df, planted = _corpus(spark, n_base=50, n_dups=15)
    sh = {r.doc_id: r.s for r in df.select("doc_id", simhash64("text").alias("s")).collect()}
    # ground truth: planted pairs whose true hamming distance is <= 6
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    truth = {
        (min(a, b), max(a, b)) for a, b in planted if ham(sh[a], sh[b]) <= 6
    }
    got = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs_simhash(df, "doc_id", "text", max_hamming=6).collect()
    }
    assert truth, "no close planted pairs generated?"
    # r8 banding (max_hamming+1 blocks) pigeonhole-guarantees recall 1.0
    # across the whole advertised radius
    recall = len(got & truth) / len(truth)
    assert recall == 1.0, (recall, truth - got)
    # precision: every reported pair's hamming really is <= 6
    for a, b in got:
        assert ham(sh[a], sh[b]) <= 6


def test_minhash_mass_identical_docs_no_quadratic_bucket(spark):
    """10k byte-identical copies (the hot-bucket scale killer) collapse
    to one representative before LSH: completes fast, emits no
    intra-identical pairs, still finds the genuine near-dups."""
    import time

    df, planted = _corpus(spark, n_base=40, n_dups=10)
    hot = spark.range(100_000, 110_000).select(
        F.col("id").alias("doc_id"), F.lit("the same page scraped ten thousand times").alias("text")
    )
    t0 = time.perf_counter()
    pairs = near_dup_pairs_minhash(df.unionByName(hot), "doc_id", "text", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    assert dt < 60, f"mass-duplicate corpus took {dt:.0f}s — quadratic bucket?"
    # no pair touches two members of the identical-text class
    assert not any(a >= 100_000 and b >= 100_000 for a, b in got), (
        "intra-identical pairs should be collapsed (exact-dedup domain)"
    )
    # genuine near-dups among distinct texts still found
    assert any((min(a, b), max(a, b)) in got for a, b in planted)


def test_minhash_plan_shows_bucket_cap(spark):
    df, _ = _corpus(spark, n_base=10, n_dups=0)
    plan = near_dup_pairs_minhash(df, "doc_id", "text", bucket_cap=123)._jdf.queryExecution().toString()
    assert "slice" in plan and "123" in plan, "bucket cap not visible in plan"


def test_lsh_bucket_stats(spark):
    from datalake_worker_spark.functions.dedup import lsh_bucket_stats

    df, _ = _corpus(spark, n_base=30, n_dups=10)
    row = lsh_bucket_stats(df, "doc_id", "text", bucket_cap=2).collect()[0]
    assert row.n_buckets > 0 and row.max_bucket >= 2
    assert row.overflow_ids >= 0


def test_simhash_fingerprints_match_column_variant(spark):
    from datalake_worker_spark.functions.dedup import simhash_fingerprints

    df, _ = _corpus(spark, n_base=25, n_dups=5)
    a = {r.doc_id: r.s for r in df.select("doc_id", simhash64("text").alias("s")).collect()}
    b = {r.doc_id: r.simhash for r in simhash_fingerprints(df, "doc_id", "text").collect()}
    assert a == b


def test_simhash_deterministic(spark):
    df, _ = _corpus(spark, n_base=10, n_dups=0)
    a = df.select("doc_id", simhash64("text").alias("s")).collect()
    b = df.select("doc_id", simhash64("text").alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hamming64_matches_python(spark):
    rows = [(1, 0b1010, 0b0110), (2, -1, 0), (3, 12345678901234, 98765432109876)]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    got = {r.i: r.h for r in df.select("i", hamming64(F.col("a"), F.col("b")).alias("h")).collect()}
    for i, a, b in rows:
        assert got[i] == bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_duplicate_spans_planted(spark):
    """Two docs share one 20-word run; a third is disjoint. The shared
    run must surface as exactly one island of 20 tokens in each sharer,
    and the disjoint doc must not appear."""
    from datalake_worker_spark.functions.dedup import duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(20))
    a = "alpha one two three " + shared + " tail aaa bbb ccc"
    b = "zeta nine eight " + shared + " omega ddd eee fff ggg"
    c = " ".join(f"uniq{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(df, "doc_id", "text", n=10).collect()
    }
    assert set(out) == {1, 2}
    for doc in (1, 2):
        r = out[doc]
        assert r["n_islands"] == 1
        assert r["dup_tokens"] == 20


def test_d16_char_jaccard_planted_cjk_pair(spark, tmp_path):
    """True-positive gate for d16 (its driver green at sf0.01 was a
    0-row hash-match — both engines agreeing on an empty set proves
    nothing about recall). A whitespace-free CJK near-duplicate pair
    must surface with jaccard >= 0.2, and a disjoint same-lang,
    same-length doc must not pair with either."""
    from datalake_worker_spark.registry import REGISTRY

    base = "漢字文書処理系統試験資料集合第一巻内容本文節選抜粋例示用途限定公開版本番号零壱弐参肆"
    near = base[:-5] + "伍陸柒捌玖"  # same length, last 5-gram block differs
    disjoint = "全然違程内容持別文章同言語同長補埋草稿置換行列式微分積分幾何代数確率統計解析関数論集"
    assert len(base) == len(near) == len(disjoint)
    rows = [
        (1, base, "zh", "planted", len(base)),
        (2, near, "zh", "planted", len(near)),
        (3, disjoint, "zh", "planted", len(disjoint)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    out = REGISTRY["d16_char_jaccard_pairs"].spark_fn(spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out}
    assert (1, 2) in pairs, f"planted near-dup not found: {pairs}"
    assert pairs[(1, 2)] >= 0.2
    assert set(pairs) == {(1, 2)}, f"disjoint doc paired: {pairs}"


def test_m06_phash_planted_pairs(spark):
    """Perceptual-hash near-dup: a length-preserving few-byte
    perturbation of a payload must pair with its original at small
    Hamming distance; two disjoint payloads must not pair."""
    from datalake_worker_spark.functions.multimodal import (
        perceptual_hash,
        phash_near_pairs,
    )

    base = bytes(range(256)) * 8  # structured 2 KB payload
    near = bytes([255 - base[0], 255 - base[1]]) + base[2:]  # 2 bytes flipped
    other = bytes((i * 37 + 11) % 251 for i in range(2048))
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(near)), (3, bytearray(other))],
        "doc_id long, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(perceptual_hash(df, "doc_id", "payload")).collect()
    }
    assert (1, 2) in pairs, pairs
    assert all(k == (1, 2) for k in pairs), pairs


def test_m06_phash_worst_case_bit_spread(spark):
    """Pigeonhole guarantee at the verify threshold: a pair at Hamming
    distance exactly 6 with the differing bits spread 2+2+1+1 across
    the four 16-bit quarters (the spread the old 4-band layout missed,
    ADVICE r6) must be surfaced by the 7-band candidate join."""
    from datalake_worker_spark.functions.multimodal import phash_near_pairs

    base = 0x0123_4567_89AB_CDEF
    # flip bits 0,1 (quarter 0), 17,18 (quarter 1), 35 (quarter 2), 50 (q3)
    near = base ^ ((1 << 0) | (1 << 1) | (1 << 17) | (1 << 18) | (1 << 35) | (1 << 50))
    far = base ^ ((1 << 63) - 1)  # ~32+ bits away from both

    def signed(h):
        return h - (1 << 64) if h >= 1 << 63 else h

    df = spark.createDataFrame(
        [(1, signed(base)), (2, signed(near)), (3, signed(far))],
        "doc_id long, phash long",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in phash_near_pairs(df).collect()}
    assert pairs.get((1, 2)) == 6, pairs
    assert set(pairs) == {(1, 2)}, pairs


def test_simhash_hot_bucket_capped(spark):
    """A mass-duplicate fingerprint bucket (every doc identical) must
    expand at most cap² pairs, not n² — the d04 skew guard applied to
    the fingerprint families (r7). r8: the cap is a row_number window
    filter BEFORE the collect_list, so the hot bucket never materializes
    more than cap structs in an aggregation buffer; the window is
    visible in the plan."""
    from datalake_worker_spark.functions.dedup import near_dup_pairs_simhash

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(300)],
        "doc_id long, text string",
    )
    from datalake_worker_spark.plans.inspect import formatted_plan

    pairs = near_dup_pairs_simhash(df, "doc_id", "text", bucket_cap=16)
    plan = formatted_plan(pairs)
    assert "row_number" in plan, plan
    n = pairs.count()
    assert 0 < n <= 16 * 15 // 2, n  # cap members -> at most C(16,2) pairs
