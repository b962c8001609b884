#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for flagship queries at
sf0.1 (run after changing any headline operator)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from datalake_worker_spark.session import get_spark
from datalake_worker_spark import registry
from datalake_worker_spark.plans.inspect import formatted_plan

FLAGSHIP = [
    ("q01_pricing_summary", "scan → pushed filter → two-phase decimal agg"),
    ("q05_local_supplier_volume", "6-way join: facts shuffle on keys, dims broadcast"),
    ("x01_asof_purchase_click", "as-of join: ONE exchange, sorted window, no range join"),
    ("w01_topk_per_group", "per-group top-k: single shuffle + window, no global sort"),
    ("d04_minhash_near_dups", "minhash: explode → partial-agg signatures → band bucket join"),
    ("v01_exact_cosine_topk", "broadcast query set × corpus, vectors projected away pre-shuffle"),
    ("q21_last_shipper", "both EXISTS folded into one window pass; dims broadcast"),
    ("v04_ann_ivf_topk", "IVF: literal centroids, cell equi-join is the only shuffle"),
    ("smp05_temperature_resample", "quota table broadcast back onto the sha-ranked corpus"),
    ("io06_bucketed_colocated_join", "bucketed sort-merge join: ZERO exchanges before the final agg"),
    ("v02_ann_lsh_topk", "LSH ANN: Arrow-batched bucket UDF, equi-join on (table, bucket)"),
    ("j10_salted_skew_join", "salted join: hot key spread over (key, salt) reducers"),
    ("io08_merge_upsert", "MERGE/CDC apply: ONE full-outer sort-merge join, filters pushed to all scans"),
    ("x05_interval_lookup_join", "interval lookup: broadcast non-equi dim (BNLJ), zero fact shuffle"),
    ("d12_url_canonical_dedup", "URL dedup: all regex in the scan stage, map-side-combined group-by"),
    ("smp07_weighted_sample", "weighted sample: TakeOrdered top-k, no global sort, no shuffle"),
    ("w09_ewma_smoothing", "EWMA recurrence: FlatMapGroupsInPandas, ONE exchange on the key"),
    ("a13_content_fingerprint", "content fingerprint: partial-agg sha-sum, one narrow shuffle"),
    ("d14_bloom_decontamination", "bloom decontamination: binary-literal bitmap probed map-side, shuffle carries only survivors"),
    ("d15_duplicate_spans", "duplicate spans: two-phase gram agg, island window over duplicated starts only"),
    ("t18_document_chunking", "chunking: tokenize + posexplode, zero shuffles"),
    ("smp10_dsir_importance", "DSIR: broadcastable vocab join, decimal log-weight partial aggs"),
    ("w13_time_weighted_average", "TWAP: lead window + aggregate share ONE user_id exchange"),
    ("w14_ohlc_bars", "OHLC bars: window endpoints + bar agg on one (user, day) exchange"),
    ("v09_ann_ivfpq_topk", "IVF+PQ: literal codebooks, ADC lookups, cell equi-join only shuffle"),
    ("w15_funnel_steps", "funnel: 3 dependent step windows + per-user collapse on ONE user exchange, no self-joins"),
    ("t21_textrank_keywords", "TextRank: per-iteration edges-join-ranks + two-phase vertex sum, TakeOrdered top-10"),
    ("x07_last_touch_attribution", "attribution: as-of collapsed to one running-MAX window, no join"),
    ("io15_snapshot_diff", "snapshot diff: ONE full-outer key join, unchanged rows filtered before output"),
    # the r6 extended-suite "regression" set: recorded so any future
    # slowdown can be mechanically diffed against the committed plan
    ("q07_volume_shipping", "nation-pair OR join: dims broadcast, one fact exchange into the 3-key agg"),
    ("q13_customer_order_distribution", "left-outer count distribution: one join exchange, two-phase count agg"),
    ("a08_approx_aggregates", "approx aggregates: map-side sketch partials, one tiny merge exchange"),
    # round-7 late additions
    ("w18_max_concurrent_intervals", "sweep line: ONE exchange, window + agg share the partitioning"),
    ("x08_interval_overlap_join", "interval overlap: binned equi-join, first-overlap-bin dedup, no BNLJ"),
    ("io20_data_quality_audit", "constraint audit: conditional-sum aggregates, FK dim broadcast"),
    # round-8 additions
    ("t27_ngram_novelty", "novelty (r9 join-free rewrite): the ONLY gram-keyed op is the partial-min groupBy; joins key on doc_id — Zipfian-gram skew-proof"),
    ("d17_fuzzy_decontamination", "fuzzy decontam: benchmark gram table broadcast, corpus scanned once map-side"),
    ("a16_cms_heavy_hitters", "CMS audit: sketch probed as ONE literal, no join; top-20 via limit"),
    ("d08_simhash_near_dups", "simhash near-dup: 9-band explode, row_number-capped buckets, ONE band exchange"),
    # round-9 additions
    ("a17_ddsketch_quantiles", "DDSketch: partial-agg counter merge, window over counter rows, final agg reuses the g-partitioning — two exchanges total"),
    ("m08_cdc_chunking", "CDC chunking: one posexplode, per-doc boundary windows, (doc,chunk) rebuild, distinct-sha wide stage"),
    ("t10_unigram_logprob", "salted Zipfian token join: freq table replicated 8x, hot tokens spread over (tok, salt) reducers"),
    # round-10 additions
    ("a18_kmv_distinct_sketch", "KMV sketch: one distinct + bucketed two-phase bottom-k; set algebra on model-sized frames"),
    ("v12_exact_knn_join", "kNN join: 4x8 replication grid, ONE cogroup shuffle, per-cell Arrow matmul, global window top-3"),
    ("t32_repetition_filter", "repetition filter: every shuffle key contains doc_id — no corpus-frequency key anywhere"),
    ("d18_substring_dedup_spans", "substring spans: gram partial-agg, salted dup join-back, doc-local island windows"),
    ("v13_kmeans_clusters", "k-means: literal centroids (no join), ONE vec_id exchange per round, exact decimal distances"),
    # round-11 additions
    ("v14_lsh_candidate_audit", "LSH audit twin: ONE nested-literal fold expression, band equi-join, exact rerank"),
    ("q26_nation_pagerank", "PageRank: broadcast nation dims, ONE edge-frame scan per round, rank literals"),
    ("d19_symspell_typo_pairs", "SymSpell: |w|x variant explode, ONE variant equi-join, per-pair levenshtein verify"),
    # round-12 additions (the audit-twin wave)
    ("d20_simhash_audit", "SimHash audit: sha-40 vote fold, 4-band pigeonhole explode, capped bucket join"),
    ("d21_minhash_audit", "MinHash audit: k-MIN signature fold, band equi-join, candidate-only Jaccard verify"),
    ("a19_cms_audit", "CMS audit: one-job cell counts, counter frame BROADCAST onto the 20-row probe"),
    ("d22_bloom_audit", "Bloom audit: sha positions, bitmap literal probed map-side, join-free plan"),
    ("t34_binned_stump", "binned stump: partial-agg histogram, rank-derived boundary frame, decimal-first Gini"),
    ("v15_ivf_audit", "IVF audit: v13-trained literal centroids, cell equi-join only shuffle, fold-cosine rerank"),
    ("t35_bm25_search", "BM25: query-term-filtered tf partial agg, df/stats broadcast, decimal sums, rank-limited top-k"),
    ("q27_label_propagation", "LPA: broadcast dims into the edge build, per-round (dst,label) agg, label literals"),
    ("v16_ivfpq_audit", "IVF+PQ audit: literal centroids+codebooks, cell equi-join, ADC array lookups, refine rerank"),
    ("m09_phash_audit", "pHash audit: char-explode partial-agg grid, banded equi-join, capped buckets"),
    ("d23_keeplist_audit", "keep-list audit: d21 band join feeds pointer-jump CC rounds, min-id survivor left join"),
    ("d24_semdedup_audit", "SemDeDup audit: cluster equi-join bounds the pair stage, fold-cosine filter"),
    ("a20_hll_audit", "HLL audit: one partial-agg register MAX, bounded (lang x 256) frame, merge without re-scan"),
    ("t36_winnow_audit", "winnowing: one char-position explode, ONE doc-partitioned window MIN, distinct — no joins"),
    ("q28_sssp_bellman_ford", "SSSP: broadcast dims into the edge build, per-round min-plus (dst) agg, distance literals"),
    ("w20_linear_interpolation", "interpolation: bounds agg, sequence grid, left join, two ignorenulls window passes on ONE exchange"),
]

spark = get_spark(cpus="8", extra_conf={"spark.ui.showConsoleProgress": "false"})
sf = "/root/testdata/sf0.1"
out = ["# PLANS — flagship physical plans (sf0.1, AQE pre-execution)",
       "",
       "Regenerate with `python tools_gen_plans.py`. What to look for is noted per query;",
       "`tests/test_plans.py` asserts these properties mechanically.",
       ""]
qs = registry.queries()
for name, note in FLAGSHIP:
    plan = formatted_plan(qs[name](spark, sf))
    # literal vectors (IVF centroids, LSH planes) make single plan lines
    # hundreds of KB — truncate; the tree structure is the content
    plan = "\n".join(
        (ln[:300] + " …<truncated literals>") if len(ln) > 300 else ln
        for ln in plan.splitlines()
    )
    # keep the operator tree + the scan details, trim codegen ids noise
    out.append(f"## {name}\n\n*{note}*\n\n```\n{plan.strip()}\n```\n")
open("PLANS.md", "w").write("\n".join(out))
print("PLANS.md written:", len("\n".join(out)), "chars")
