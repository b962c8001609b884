"""Behavioral tests for corpus-level pipeline operators (pipeline.py):
planted-case semantics for segment dedup / decontamination, stability of
the hash split, and the HLL sketch merge identity. The cross-engine
oracle equivalence of t14/d09/smp06 is covered by test_oracle_queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_worker_spark.functions.pipeline import (
    hash_split,
    ngram_decontaminate,
    pii_redact,
    segment_dedup,
    text_segments,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_dedup_drops_cross_doc_spans(spark):
    shared = WORDS  # exactly one 10-word segment
    unique1 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    unique2 = "uniform victor whiskey xray yankee zulu one two three four"
    d = _docs(
        spark,
        [
            (1, f"{shared} {unique1}"),
            (2, f"{shared} {unique2}"),
            # leading word shifts the span boundary, so although doc 3
            # contains unique2's words verbatim, none of its 10-word
            # segments equals any segment of doc 2
            (3, "five " + unique2),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(d, "doc_id", "text", seg_words=10).collect()
    }
    # the shared leading span is dropped from both carriers…
    assert out[1]["n_dropped"] == 1 and out[1]["cleaned_text"] == unique1
    assert out[2]["n_dropped"] == 1 and out[2]["cleaned_text"] == unique2
    # …and doc 3 survives intact thanks to the shifted boundary
    assert out[3]["n_dropped"] == 0
    assert out[3]["cleaned_text"] == "five " + unique2
    assert out[3]["n_segments"] == 2


def test_segment_dedup_all_dropped_keeps_doc_with_empty_text(spark):
    d = _docs(spark, [(1, WORDS), (2, WORDS)])
    out = segment_dedup(d, "doc_id", "text", seg_words=10).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["cleaned_text"] == "" and r["n_dropped"] == 1 for r in out)


def test_text_segments_short_doc_is_single_segment(spark):
    d = _docs(spark, [(1, "just three words")])
    segs = text_segments(d, "doc_id", "text", seg_words=10).collect()
    assert [(s["pos"], s["seg"]) for s in segs] == [(0, "just three words")]


def test_decontamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(100, WORDS)])
    corpus = _docs(
        spark,
        [
            # contains "charlie delta echo foxtrot golf" — a bench 5-gram
            (1, "zzz charlie delta echo foxtrot golf yyy"),
            # same words, different order: no 5-gram overlap
            (2, "golf foxtrot echo delta charlie"),
        ],
    )
    out = ngram_decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    assert [(r["doc_id"], r["n_matched"]) for r in out] == [(1, 1)]


def test_hash_split_is_stable_and_total(spark, sf_dir):
    from datalake_worker_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", hash_split(d, "doc_id").alias("s")).collect()
    b = (
        d.repartition(13)
        .select("doc_id", hash_split(d, "doc_id").alias("s"))
        .collect()
    )
    assert sorted(a) == sorted(b)  # stable under repartitioning
    by_split = {}
    for r in a:
        by_split[r["s"]] = by_split.get(r["s"], 0) + 1
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]  # 12/16 vs 2/16 expected


def test_pii_redact_replaces_and_counts(spark):
    d = _docs(
        spark,
        [
            (1, "mail a@b.com and c.d+x@e.co.uk end"),
            (2, "call +1-555-0100 or +44-20-7946-0958 now"),
            (3, "host 10.0.0.1 peer 192.168.1.254"),
            (4, "no pii here at all"),
            (5, "mix bob@example.org via 8.8.8.8"),
        ],
    )
    out = {
        r["doc_id"]: r for r in pii_redact(d, "text", ["doc_id"]).collect()
    }
    assert out[1]["redacted_text"] == "mail <EMAIL> and <EMAIL> end"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (2, 0, 0)
    assert out[2]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_phone"] == 2
    assert out[3]["redacted_text"] == "host <IP> peer <IP>"
    assert out[3]["n_ip"] == 2
    assert out[4]["redacted_text"] == "no pii here at all"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ip"]) == (0, 0, 0)
    assert out[5]["redacted_text"] == "mix <EMAIL> via <IP>"


def test_hll_rollup_merge_identity(spark, sf_dir):
    """Union of per-group sketches must equal the whole-corpus sketch
    exactly (register-wise max is order- and partition-independent),
    and land within 5% of the true distinct count."""
    from datalake_worker_spark.functions.text import whitespace_tokens
    from datalake_worker_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(whitespace_tokens("text")).alias("tok"))
    merged = (
        toks.groupBy("lang")
        .agg(F.hll_sketch_agg("tok").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    direct = toks.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok")).alias("n")
    ).collect()[0]["n"]
    exact = toks.select("tok").distinct().count()
    assert merged == direct
    assert abs(merged - exact) / exact < 0.05
