#!/usr/bin/env python
"""Scale-up probe: run representative operators at sf0.1 and at a
10x-replicated copy (~sf1) and record the wall-clock ratio per query.

The replication shifts primary keys per copy (orderkey/doc_id/event_id/
vec_id) while leaving dimension FKs intact, so joins stay valid and
per-key cardinalities grow the way a bigger corpus would. documents
text is replicated verbatim — dedup operators therefore see 10x exact
duplicates, which is exactly the hot-page skew the mass-dup guards are
designed for.

A query whose ratio is ~10x scales linearly (shuffle/agg bound); well
under 10x means fixed overhead dominated the small run; well over 10x
is a super-linear red flag (pair explosion, driver loop). Results land
in scale_probe.json and are summarized in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_BIG = os.environ.get("SPARK_GRAFT_SFX_DIR", "/tmp/dlw_sfx1")
COPIES = 10

# key column to shift per fact table; dims replicate once
FACT_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

PROBE = [
    "q01_pricing_summary",       # scan + wide agg
    "q03_shipping_priority",     # 3-way join + agg + topk
    "q18_large_volume_customer", # join + having subquery
    "a03_count_distinct_having", # distinct agg
    "w06_sessionization",        # window over events
    "x02_asof_event_order",      # as-of join
    "d01_exact_dedup_keep_first",# hash dedup (now 10x dups)
    "d04_minhash_near_dups",     # LSH near-dup (10x exact dups planted)
    "t01_token_stats",           # text scan
    "smp03_exact_percentiles",   # sort-based percentiles
    "v01_exact_cosine_topk",     # brute-force ANN baseline
    "w13_time_weighted_average", # lead-window + agg, one shuffle
    "w14_ohlc_bars",             # windowed endpoints + bar agg
    "d16_char_jaccard_pairs",    # blocked pair join (CJK dedup path)
    "smp10_dsir_importance",     # distributed exact rank selection
    "d08_simhash_near_dups",     # capped fingerprint-band expansion (r7)
    "m06_perceptual_near_dup",   # 7-band phash + cap (r7)
    "v02_ann_lsh_topk",          # multi-probe LSH (r7)
    "j12_binned_range_join",     # binned equi-shaped range join (r7)
    "w17_rolling_median",        # constant-frame exact median (r7)
    "v04_ann_ivf_topk",          # IVF ANN — numpy-trained quantizer (r7)
    "v09_ann_ivfpq_topk",        # IVF+PQ ADC — numpy-trained quantizer (r7)
    "w18_max_concurrent_intervals",  # sweep-line concurrency (r7 late)
    "x08_interval_overlap_join",     # binned overlap equi-join (r7 late)
    "t27_ngram_novelty",             # global gram first-owner join (r8)
    "d17_fuzzy_decontamination",     # broadcast-gram containment (r8)
    "a16_cms_heavy_hitters",         # CMS build + literal probe (r8)
    "io22_python_datasource_scan",   # Python DataSource row-group partitions (r8)
    "a17_ddsketch_quantiles",        # DDSketch counter build + window (r9)
    "m08_cdc_chunking",              # CDC word chunking + distinct-sha audit (r9)
    "a18_kmv_distinct_sketch",       # bottom-k distinct set algebra (r10)
    "t30_bpe_subword_tokens",        # iterative BPE trainer — N bounded jobs (r10)
    "t31_quality_logreg",            # relational GD trainer — T bounded rounds (r10)
    "v12_exact_knn_join",            # 1-bucket-theta grid kNN join (r10)
    "t32_repetition_filter",         # doc-local n-gram repetition metrics (r10)
    "d18_substring_dedup_spans",     # corpus-dup L-gram spans, salted join-back (r10)
    "v13_kmeans_clusters",           # relational Lloyd — per-round vec_id agg (r10)
    "q25_supplier_triangles",        # degree-oriented triangle count (r10)
]


def build_big(spark) -> None:
    from pyspark.sql import functions as F
    from datalake_worker_spark.sources.readers import load_table

    os.makedirs(SF_BIG, exist_ok=True)
    for t in DIMS:
        dst = os.path.join(SF_BIG, f"{t}.parquet")
        if not os.path.exists(dst):
            load_table(spark, SF_SRC, t).write.mode("overwrite").parquet(dst)
    for t, key in FACT_KEYS.items():
        dst = os.path.join(SF_BIG, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, SF_SRC, t)
        shift = (base.agg(F.max(key)).first()[0] or 0) + 1
        copies = [
            base.withColumn(key, (F.col(key) + F.lit(int(i * shift))).cast("long"))
            for i in range(COPIES)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"built {t}: {COPIES}x", flush=True)


def streaming_per_batch_probe(spark, sf_dir, n_batches=12) -> dict:
    """Replay n_batches micro-batches through st13 (incremental dedup)
    and st14 (streaming vector index) and report per-batch latency
    growth: median of the last 3 batches over the median of batches
    2-4 (batch 0/1 carry trigger warm-up and quantizer training). The
    two operators' per-batch cost must stay ~flat as state accumulates
    — history is probed via broadcast joins / pruned cell dirs and the
    state folds every compact_every epochs, so nothing per-batch should
    scale with ingest history."""
    import statistics as stats
    import tempfile

    from pyspark.sql import functions as F

    from datalake_worker_spark.sources.readers import load_table
    from datalake_worker_spark.streaming.incdedup import run_incremental_near_dup
    from datalake_worker_spark.streaming.vecindex import run_streaming_vector_index
    from datalake_worker_spark.functions.similarity import to_double_array

    def per_batch(root):
        latest = {}
        with open(os.path.join(root, "_batch_seconds.jsonl")) as fh:
            for line in fh:
                r = json.loads(line)
                latest[r["epoch"]] = r["seconds"]
        return [latest[e] for e in sorted(latest)]

    out = {}
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doc_batches = [
        d.filter(F.col("doc_id") % n_batches == m) for m in range(n_batches)
    ]
    root13 = tempfile.mkdtemp(prefix="dlw_probe_st13_")
    run_incremental_near_dup(spark, doc_batches, root=root13, compact_every=4)
    t13 = per_batch(root13)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    vec_batches = [
        e.filter(F.col("vec_id") % n_batches == m) for m in range(n_batches)
    ]
    root14 = tempfile.mkdtemp(prefix="dlw_probe_st14_")
    run_streaming_vector_index(
        spark, vec_batches, e.filter(F.col("vec_id") < 8),
        k=5, n_clusters=8, nprobe=4, dim=64, root=root14, compact_every=4,
    ).count()
    t14 = per_batch(root14)
    from datalake_worker_spark.streaming.spacesaving import (
        run_spacesaving_topk,
    )

    root20 = tempfile.mkdtemp(prefix="dlw_probe_st20_")
    run_spacesaving_topk(spark, doc_batches, root=root20)
    t20 = per_batch(root20)
    for name, t in (("st13_incremental_near_dup", t13),
                    ("st14_streaming_vector_index", t14),
                    ("st20_spacesaving_topk", t20)):
        early = stats.median(t[2:5])
        late = stats.median(t[-3:])
        out[name] = {
            "per_batch_s": t,
            "early_s": round(early, 3),
            "late_s": round(late, 3),
            "growth": round(late / early, 2) if early else None,
        }
        print(f"{name}: early {early:.2f}s late {late:.2f}s "
              f"growth {out[name]['growth']}", flush=True)
    return out


def t27_skew_probe(spark, n_small: int = 40_000, runs: int = 3) -> dict:
    """VERDICT r8 item 3: probe t27 on a ZIPFIAN-gram corpus at two
    scales — 30% of docs share one boilerplate 5-gram (a genuinely hot
    gram key; the synthetic sf tables have near-uniform gram
    multiplicities, so the standard probe never exercises this). The r9
    join-free rewrite keeps the hot gram inside a map-side partial min,
    so the ratio should track the uniform-corpus t27 entry."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datalake_worker_spark import registry

    boiler = "b0 b1 b2 b3 b4"  # one hot 5-gram in 30% of docs

    def build(n_docs: int) -> str:
        root = tempfile.mkdtemp(prefix=f"dlw_t27skew_{n_docs}_")
        uniq = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.concat(
                    F.lit("u"), F.col("doc_id"), F.lit("_"), j
                ),
            ),
        )
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 10 < 3, F.lit(boiler))
                .otherwise(uniq)
                .alias("text"),
                F.lit("en").alias("lang"),
                F.lit("synth").alias("source"),
            )
            .withColumn("n_chars", F.length("text"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(root, "documents.parquet"))
        )
        return root

    fn = registry.queries()["t27_ngram_novelty"]
    out = {}
    roots = []
    for label, n in (("small", n_small), ("big", n_small * COPIES)):
        root = build(n)
        roots.append(root)
        fn(spark, root).count()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, root).count()
            samples.append(time.perf_counter() - t0)
        out[f"{label}_s"] = round(statistics.median(samples), 3)
        print(f"t27_skew {label} ({n} docs): {out[f'{label}_s']:.3f}s",
              flush=True)
    out["ratio"] = (
        round(out["big_s"] / out["small_s"], 2) if out["small_s"] else None
    )
    out["hot_gram_share"] = 0.3
    for root in roots:
        shutil.rmtree(root, ignore_errors=True)
    return out


def dedup_skew_probe(
    spark, n_docs: int = 100_000, cap: int = 512
) -> dict:
    """VERDICT r12 item 8: plant a Zipf-1.2 KEY distribution into a
    10x-scale corpus and prove the dedup family's bucket caps bound the
    hot LSH bucket. Template ids follow the power-law tail
    P(K >= k) ~ k^-(s-1) with s = 1.2 (inverse-CDF transform of a
    deterministic xxhash64 uniform), so the hottest template covers
    ~13% of all documents — every one of those docs shares ALL its
    shingles, collides in every MinHash band, and lands in one bucket:
    exactly the mass-duplication skew the row_number cap exists for.
    Measured: the pre-cap hot-bucket population (the hazard), the
    post-cap retained population (== cap), and the total emitted pair
    count against the cap*(cap-1)/2-per-bucket-per-band bound — the
    guarantee that pair expansion is O(bands * cap^2) REGARDLESS of key
    skew, never O(hot_bucket^2)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datalake_worker_spark.functions.dedup import (
        capped_fingerprint_band_pairs,
        shingles_from_words,
    )
    from datalake_worker_spark.operators.wave13 import (
        D21_BANDS,
        D21_K,
        D21_ROWS,
        sha40,
    )

    s = 1.2
    u = (F.pmod(F.xxhash64(F.col("id")), 1000000) + 0.5) / 1000000.0
    k = F.least(
        F.lit(200000), F.ceil(F.pow(u, F.lit(-1.0 / (s - 1.0))))
    ).cast("long")
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(8)),
            lambda j: F.concat(F.lit("w"), F.col("k"), F.lit("_"), j),
        ),
    )
    d = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), k.alias("k"))
        .select("doc_id", words.alias("text"))
    )
    sh = (
        d.select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id", F.explode(shingles_from_words(F.col("_w"))).alias("sh")
        )
        .distinct()
    )
    aggs = [
        F.min(sha40(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(D21_K)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    sig_str = F.concat_ws(
        ":", *[F.col(f"h{i}").cast("string") for i in range(D21_K)]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{b * D21_ROWS + j}").cast("string")
                        for j in range(D21_ROWS)
                    ],
                ).alias("band_val"),
            )
            for b in range(D21_BANDS)
        ]
    )
    banded = sig.select(
        "doc_id", sig_str.alias("_sig"), F.explode(bands).alias("b")
    ).select(
        "doc_id", "_sig",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    ).persist()
    t0 = time.perf_counter()
    pre = (
        banded.groupBy("band_idx", "band_val")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    wcap = W.partitionBy("band_idx", "band_val").orderBy("doc_id")
    post = (
        banded.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= cap)
        .groupBy("band_idx", "band_val")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    n_pairs = capped_fingerprint_band_pairs(
        banded, "_sig", "doc_id", cap
    ).count()
    # the structural bound the cap guarantees: each bucket contributes
    # at most C(min(members, cap), 2) pairs, summed over all buckets
    # (a Zipf corpus has MANY hot buckets, not one — the first probe
    # run's bands*cap^2 bound was wrong for exactly that reason)
    m = F.least(F.col("count"), F.lit(cap))
    bound = int(
        banded.groupBy("band_idx", "band_val")
        .count()
        .agg(F.sum(m * (m - 1) / 2))
        .first()[0]
    )
    elapsed = round(time.perf_counter() - t0, 2)
    banded.unpersist(blocking=False)
    out = {
        "n_docs": n_docs,
        "zipf_s": s,
        "cap": cap,
        "max_bucket_pre_cap": int(pre),
        "max_bucket_post_cap": int(post),
        "max_bucket_pairs_capped": cap * (cap - 1) // 2,
        "max_bucket_pairs_uncapped_would_be": int(pre) * (int(pre) - 1) // 2,
        "emitted_pairs": int(n_pairs),
        "pair_bound_sum_min_cap2": bound,
        "probe_s": elapsed,
    }
    assert post <= cap, out
    assert n_pairs <= bound, out
    print(f"dedup_skew: {json.dumps(out)}", flush=True)
    return out


def t06_skew_probe(spark, n_small: int = 40_000, runs: int = 3) -> dict:
    """VERDICT r9 item 4: the r9 Zipfian audit SALTED the
    occurrence⋈frequency joins (t06/t10/t25/smp10/d15) but never probed
    one on a hot-TOKEN corpus — t27 (join eliminated) got `t27_skew`,
    the salted family did not. Here ~30% of all token occurrences are
    ONE token ("hot", 16x repeated in 30% of docs) drawn against a
    BOUNDED 50k filler vocabulary — bounded so the probe isolates the
    hot KEY (unique-per-doc fillers à la t27's corpus make the
    vocabulary corpus-sized, and the salt's 8x replication of a
    corpus-sized df table dominates the timing — measuring vocabulary
    growth, not skew; the first r10 probe run demonstrated exactly
    that). Recorded alongside: the UNSALTED plain-join A/B on the same
    big corpus, so the record shows what the salt buys or costs at
    this scale."""
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datalake_worker_spark import registry

    def build(n_docs: int) -> str:
        root = tempfile.mkdtemp(prefix=f"dlw_t06skew_{n_docs}_")
        filler = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.concat(
                    F.lit("u"),
                    F.pmod(F.col("doc_id") * 16 + j, F.lit(50_000)),
                ),
            ),
        )
        hot = F.concat_ws(" ", F.array_repeat(F.lit("hot"), 16))
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 10 < 3, hot).otherwise(filler).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("synth").alias("source"),
            )
            .withColumn("n_chars", F.length("text"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(root, "documents.parquet"))
        )
        return root

    def unsalted_t06(spark_, root):
        """t06 with the salt removed (plain tf⋈df join) — the A/B arm."""
        from datalake_worker_spark.functions.text import explode_tokens
        from datalake_worker_spark.sources import load_table

        d = load_table(spark_, root, "documents")
        tok = explode_tokens(d)
        tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
        n = d.agg(F.count("*").cast("double").alias("n_docs"))
        scored = tf.join(df, "tok").crossJoin(F.broadcast(n)).select(
            "doc_id", "tok",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
            .alias("tfidf"),
        )
        w = W.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), F.col("tok").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 3)
        )

    fn = registry.queries()["t06_tfidf_top_terms"]
    out = {}
    roots = {}
    for label, n in (("small", n_small), ("big", n_small * COPIES)):
        root = build(n)
        roots[label] = root
        fn(spark, root).count()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, root).count()
            samples.append(time.perf_counter() - t0)
        out[f"{label}_s"] = round(statistics.median(samples), 3)
        print(f"t06_skew {label} ({n} docs): {out[f'{label}_s']:.3f}s",
              flush=True)
    out["ratio"] = (
        round(out["big_s"] / out["small_s"], 2) if out["small_s"] else None
    )
    # unsalted A/B on the big corpus only (the scale where skew matters)
    unsalted_t06(spark, roots["big"]).count()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        unsalted_t06(spark, roots["big"]).count()
        samples.append(time.perf_counter() - t0)
    out["unsalted_big_s"] = round(statistics.median(samples), 3)
    print(f"t06_skew big UNSALTED: {out['unsalted_big_s']:.3f}s", flush=True)
    out["hot_token_occurrence_share"] = 0.3
    out["filler_vocab"] = 50_000
    for root in roots.values():
        shutil.rmtree(root, ignore_errors=True)
    return out



def time_queries(spark, qs, sf_dir, names, runs=3) -> dict[str, float]:
    out = {}
    for n in names:
        qs[n](spark, sf_dir).count()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(samples), 3)
        print(f"{sf_dir.split('/')[-1]:>10} {n:32s} {out[n]:7.3f}s", flush=True)
    return out


def main() -> None:
    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name="dlw-scale-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if "--dedup-skew-only" in sys.argv:
        # standalone scenario (VERDICT r12 item 8): merge into the
        # existing report without re-running the full probe matrix
        skew = dedup_skew_probe(spark)
        path = "scale_probe.json"
        report = json.load(open(path)) if os.path.exists(path) else {}
        report["dedup_skew_probe"] = skew
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        return
    build_big(spark)
    qs = registry.queries()
    small = time_queries(spark, qs, SF_SRC, PROBE)
    big = time_queries(spark, qs, SF_BIG, PROBE)
    streaming = streaming_per_batch_probe(spark, SF_BIG)
    t27_skew = t27_skew_probe(spark)
    t06_skew = t06_skew_probe(spark)
    dedup_skew = dedup_skew_probe(spark)
    report = {
        "copies": COPIES,
        "small_dir": SF_SRC,
        "big_dir": SF_BIG,
        "streaming_per_batch": streaming,
        "t27_skew_probe": t27_skew,
        "t06_skew_probe": t06_skew,
        "dedup_skew_probe": dedup_skew,
        "queries": {
            n: {
                "small_s": small[n],
                "big_s": big[n],
                "ratio": round(big[n] / small[n], 2) if small[n] else None,
            }
            for n in PROBE
        },
    }
    with open("scale_probe.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({n: r["ratio"] for n, r in report["queries"].items()}))


if __name__ == "__main__":
    main()
