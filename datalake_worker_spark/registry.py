"""The declared query surface (SURVEY.md §2.2 correctness contract).

Every implemented operator registers here as a named pair:
  - ``spark_fn(spark, sf_dir) -> DataFrame``   — the engine query
  - ``oracle_sql`` (or None)                    — equivalent ANSI SQL for DuckDB
                                                  over the same parquet tables

``__spark_entry__.py`` re-exports this registry to the driver; the pytest
suite runs every pair differentially at small SF.

Determinism rules baked into every query:
  - every computed column is aliased identically in Spark and SQL;
  - float aggregations go through DECIMAL casts (order-independent, exact)
    and are cast back to DOUBLE at the end;
  - integer sums are cast to BIGINT in SQL (DuckDB widens to HUGEINT);
  - top-k always breaks ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None  # None => non-SQL-expressible; rows-only check
    category: str = "relational"
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle_sql: str | None, category: str = "relational", doc: str = ""):
    """Decorator: declare an operator query."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle_sql, category, doc)
        return fn

    return deco


#: The external driver runs queries in dict order and its correctness
#: budget truncates the run at ~50 queries per round.  The list below is
#: therefore a rotation schedule: the ~50-query prefix is this round's
#: verification budget, rewritten each round to burn the largest
#: verification debt first.
#: Round-13 ordering (VERDICT r12 item 2): the six r13 additions
#: (v16/m09/d23/d24/st22/a20/t36/q28/w20/q29/t37/d25, never driver-verified) lead — a query with
#: NO driver row ever would break the every-query-has-a-cumulative-row
#: contract — then the final SIX r7-dated rows (the staleness floor:
#: after this round no cumulative row predates r8), then the r8 cohort
#: in recorded order (the 50-row budget refreshes its first ~39).
#: Regenerated from the cumulative CORRECTNESS_r*.json files,
#: stalest cohort first; within a cohort the prior recorded run order
#: is preserved.
_PRIORITY_NAMES = [
    # never driver-verified (round-13 additions) — first
    "v16_ivfpq_audit",
    "m09_phash_audit",
    "d23_keeplist_audit",
    "d24_semdedup_audit",
    "st22_stream_stream_asof_join",
    "a20_hll_audit",
    "t36_winnow_audit",
    "q28_sssp_bellman_ford",
    "w20_linear_interpolation",
    "q29_kcore",
    "t37_kneser_ney_logprob",
    "d25_containment_audit",
    # newest driver row: round 7 (the last six; r12 burned the rest)
    "q20_heavy_suppliers_semijoin",
    "q21_last_shipper",
    "p02_grouped_map_pandas",
    "p03_grouped_agg_pandas",
    "st03_session_window",
    "st04_stream_dedup",
    # newest driver row: round 8 (50 queries)
    "w19_max_drawdown",
    "t27_ngram_novelty",
    "t28_token_entropy",
    "smp14_dup_aware_weights",
    "a16_cms_heavy_hitters",
    "d17_fuzzy_decontamination",
    "t29_source_divergence",
    "st18_streaming_drift_psi",
    "m07_chunk_dedup_manifest",
    "io22_python_datasource_scan",
    "st19_python_stream_replay",
    "st05_stream_static_join",
    "st06_stateful_user_totals",
    "st07_stream_stream_join",
    "st08_continuous_rollup",
    "d10_duplicate_clusters",
    "t14_segment_dedup",
    "d09_benchmark_decontamination",
    "smp06_hash_split",
    "t15_pii_redaction",
    "a11_hll_distinct_rollup",
    "w01_topk_per_group",
    "w02_rank_dense_ntile",
    "w03_running_lag_lead",
    "w04_range_frame",
    "w07_percent_rank_cume",
    "w05_multikey_sort_limit",
    "w06_sessionization",
    "io01_parquet_roundtrip_partitioned",
    "st01_tumbling_window",
    "st02_sliding_window",
    "t18_document_chunking",
    "t19_ngram_overlap_score",
    "d14_bloom_decontamination",
    "w10_rolling_zscore",
    "m05_image_patchify",
    "v07_mips_topk",
    "smp09_length_bucket_stats",
    "d15_duplicate_spans",
    "smp10_dsir_importance",
    "w11_scd2_intervals",
    "st11_streaming_quality_gate",
    "lk07_checkpointed_time_travel",
    "io12_binaryfile_ingest",
    "io13_zorder_layout",
    "io14_table_stats",
    "smp11_epoch_shuffle",
    "x06_asof_join_nearest",
    "t20_html_strip",
    "j11_not_in_null_aware",
    # newest driver row: round 9 (50 queries)
    "v08_pq_quantization_audit",
    "w12_running_distinct_users",
    "smp12_leakage_free_split",
    "st12_dedup_within_watermark",
    "d16_char_jaccard_pairs",
    "st10_streaming_cdc_apply",
    "lk06_time_travel_listing",
    "v06_cosine_range_search",
    "io11_dynamic_partition_overwrite",
    "w09_ewma_smoothing",
    "d13_near_dup_keep_list",
    "p04_python_udtf",
    "m04_audio_window_energy",
    "io10_corrupt_json_handling",
    "t17_quality_filter_verdict",
    "smp08_domain_mixture_resample",
    "st09_stream_stream_left_join",
    "a13_content_fingerprint",
    "io09_sorted_compaction",
    "io08_merge_upsert",
    "x05_interval_lookup_join",
    "smp07_weighted_sample",
    "d12_url_canonical_dedup",
    "t16_unicode_normalize",
    "io06_bucketed_colocated_join",
    "j10_salted_skew_join",
    "io07_orc_roundtrip",
    "w08_time_grid_fill",
    "d11_semantic_dedup",
    "a17_ddsketch_quantiles",
    "st20_spacesaving_topk",
    "io23_xml_roundtrip",
    "m08_cdc_chunking",
    "x09_temporal_anti_join",
    "x04_asof_join_tolerance",
    "s01_string_funcs",
    "s02_datetime_funcs",
    "s03_math_funcs",
    "s04_array_funcs",
    "s05_explode_tokens",
    "s06_posexplode",
    "s07_json_map",
    "s08_conditional",
    "s10_map_funcs",
    "u01_union_all",
    "u02_union_distinct",
    "u03_intersect",
    "u04_except_all",
    "u05_except_distinct",
    "u06_intersect_all",
    # newest driver row: round 10 (50 queries)
    "j01_left_outer_counts",
    "j02_full_outer",
    "j03_anti_join",
    "j04_cross_join",
    "j05_theta_join",
    "j06_broadcast_join",
    "j07_null_safe_join",
    "j08_composite_key_join",
    "j09_right_outer",
    "a01_rollup",
    "a02_cube",
    "a03_count_distinct_having",
    "a04_minmax_stats",
    "a05_pivot",
    "a06_grouping_sets",
    "a07_unpivot",
    "a09_collect_set_sorted",
    "x01_asof_purchase_click",
    "x02_asof_event_order",
    "x03_range_join_buckets",
    "q01_pricing_summary",
    "q02_filter_project",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q11_scalar_subquery",
    "q16_part_supplier_counts",
    "q18_large_volume_customer",
    "q22_dormant_customers",
    "p01_scalar_pandas_udf",
    "a08_approx_aggregates",
    "a18_kmv_distinct_sketch",
    "t30_bpe_subword_tokens",
    "st21_rocksdb_stateful_totals",
    "t31_quality_logreg",
    "v12_exact_knn_join",
    "t32_repetition_filter",
    "d18_substring_dedup_spans",
    "v13_kmeans_clusters",
    "q25_supplier_triangles",
    "a12_grouped_mode",
    "w13_time_weighted_average",
    "w14_ohlc_bars",
    "st13_incremental_near_dup",
    "st14_streaming_vector_index",
    "v09_ann_ivfpq_topk",
    "smp13_token_budget_fill",
    # newest driver row: round 11 (50 queries)
    "w15_funnel_steps",
    "w16_mad_outliers",
    "a14_retention_cohorts",
    "io15_snapshot_diff",
    "t21_textrank_keywords",
    "t22_pmi_collocations",
    "x07_last_touch_attribution",
    "lk08_tagged_snapshots",
    "m06_perceptual_near_dup",
    "q23_copurchase_lift",
    "io16_ttl_partition_expiry",
    "q24_hierarchy_rollup",
    "lk09_version_diff",
    "p05_map_in_arrow",
    "st15_temporal_dimension_join",
    "st16_trending_topk",
    "lk10_incremental_consumption",
    "lk01_list_chunks",
    "lk02_find_chunk_containment",
    "lk03_delete_lifecycle",
    "lk04_total_size",
    "lk05_query_through_chunk",
    "t01_token_stats",
    "t02_quality_score",
    "t03_language_id",
    "t04_doc_frequency",
    "t05_fingerprint",
    "t06_tfidf_top_terms",
    "t07_sentiment_lexicon",
    "t08_text_cleaning",
    "t09_bigram_counts",
    "t10_unigram_logprob",
    "t11_boilerplate_ngrams",
    "t12_repetition_ratio",
    "t13_bpe_token_count",
    "d01_exact_dedup_keep_first",
    "d02_exact_dedup_hash_groups",
    "d03_ngram_jaccard_pairs",
    "d04_minhash_near_dups",
    "d05_simhash_fingerprints",
    "d08_simhash_near_dups",
    "io02_csv_roundtrip",
    "io03_json_roundtrip",
    "v14_lsh_candidate_audit",
    "q26_nation_pagerank",
    "t33_decision_stump",
    "io24_dynamic_partition_pruning",
    "d19_symspell_typo_pairs",
    "io17_jdbc_roundtrip",
    "io04_in_memory_source",
]

_MODULE_ORDER = [
    "functions.graph",
    "functions.pipeline",
    "operators.windows",
    "catalog_queries",
    "sources.roundtrip",
    "functions.sampling",
    "functions.text",
    "functions.textrank",
    "functions.multimodal",
    "functions.dedup",
    "functions.setsim",
    "functions.similarity",
    "operators.udfs",
    "operators.tpch_full",
    "streaming.ops",
    "streaming.stateful",
    "streaming.rollup",
    "operators.misc",
    "operators.scalars",
    "operators.asof",
    "operators.relational",
    "operators.setops",
    "operators.tpch_extra",
    "operators.wave8",
    "operators.wave9",
    "streaming.spacesaving",
    "operators.wave10",
    "operators.wave11",
    "operators.wave12",
    "operators.wave13",
    "operators.wave14",
]


def _ordered_names() -> list[str]:
    def rank(spec: QuerySpec) -> int:
        mod = spec.spark_fn.__module__
        for i, suffix in enumerate(_MODULE_ORDER):
            if mod.endswith(suffix):
                return i
        return len(_MODULE_ORDER)

    prio = {n: i for i, n in enumerate(_PRIORITY_NAMES)}
    idx = {n: i for i, n in enumerate(REGISTRY)}
    return sorted(
        REGISTRY,
        key=lambda n: (prio.get(n, len(prio)), rank(REGISTRY[n]), idx[n]),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {n: REGISTRY[n].spark_fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        n: REGISTRY[n].oracle_sql
        for n in _ordered_names()
        if REGISTRY[n].oracle_sql is not None
    }


_LOADED = False


def _load_all():
    """Import every module that registers queries (idempotent).

    Import order IS registration order IS the external driver's run
    order, and the driver's correctness budget can truncate the run
    (round 1 stopped at query 47). Families the driver has not yet
    verified register first; long-green families last, so a truncated
    run always covers new ground."""
    global _LOADED
    if _LOADED:
        return
    # never driver-verified (round 1 truncation) — first
    from .functions import graph, pipeline  # noqa: F401
    from .operators import windows  # noqa: F401
    from . import catalog_queries  # noqa: F401
    from .sources import roundtrip  # noqa: F401
    from .functions import sampling, text, textrank, multimodal  # noqa: F401
    from .functions import dedup, setsim, similarity  # noqa: F401
    from .operators import udfs  # noqa: F401  (warms the Arrow/Python worker path for streaming's applyInPandasWithState)
    from .operators import tpch_full  # noqa: F401
    from .streaming import incdedup, ops, rollup, stateful, vecindex  # noqa: F401
    from .operators import wave7  # noqa: F401  (round-7 additions)
    from .operators import wave8  # noqa: F401  (round-8 additions)
    from .operators import wave9  # noqa: F401  (round-9 additions)
    from .streaming import spacesaving  # noqa: F401  (round-9 additions)
    from .operators import wave10  # noqa: F401  (round-10 additions)
    from .operators import wave11  # noqa: F401  (round-10 second wave)
    from .operators import wave12  # noqa: F401  (round-11 additions)
    from .operators import wave13  # noqa: F401  (round-12 additions)
    from .operators import wave14  # noqa: F401  (round-13 additions)
    # red in round 1 (a08 canonicalizer err, s09 hash) — re-check next
    from .operators import misc, scalars  # noqa: F401
    # green in round 1 — last
    from .operators import asof, relational, setops, tpch_extra  # noqa: F401

    _LOADED = True
