"""Plan-quality gates (SURVEY.md §4, the 100 TB discipline): filters
reach the parquet scan, projections prune columns, small dims broadcast,
top-k never globally sorts, window ops shuffle once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.plans.inspect import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
    simple_plan,
    uses_broadcast_join,
)
from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.sources import load_table

_load_all()


def test_filter_pushdown_q06(spark, sf_dir):
    df = REGISTRY["q06_forecast_revenue"].spark_fn(spark, sf_dir)
    assert has_pushed_filters(df), formatted_plan(df)


def test_column_pruning_q01(spark, sf_dir):
    df = REGISTRY["q01_pricing_summary"].spark_fn(spark, sf_dir)
    cols = read_schema_columns(df)
    # only the 7 columns the query needs — not all 11 of lineitem
    assert set(cols) <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }, cols


def test_small_dims_broadcast_q05(spark, sf_dir):
    df = REGISTRY["q05_local_supplier_volume"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_topk_no_global_sort(spark, sf_dir):
    """orderBy+limit must compile to TakeOrderedAndProject, not a full sort."""
    df = REGISTRY["w05_multikey_sort_limit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_window_topk_single_shuffle(spark, sf_dir):
    """Per-group top-k: one exchange (on the partition key), no more."""
    df = REGISTRY["w01_topk_per_group"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) <= 1, simple_plan(df)


def test_asof_single_shuffle(spark, sf_dir):
    """The union+window as-of join shuffles once on the join key — this is
    the property that makes it viable at 100 TB (vs the O(n·m) range join)."""
    df = REGISTRY["x01_asof_purchase_click"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) <= 1, simple_plan(df)


def test_agg_partial_before_shuffle(spark, sf_dir):
    """groupBy agg uses two-phase (partial_ before the exchange)."""
    df = REGISTRY["q01_pricing_summary"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial_" in plan or "HashAggregate" in plan, plan


def test_scan_reads_only_needed_columns_projection(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(li)
    assert cols == ["l_orderkey", "l_quantity"], cols


def test_broadcast_hint_respected(spark, sf_dir):
    df = REGISTRY["j06_broadcast_join"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """Hive-partitioned layout: a filter on the partition column prunes
    directories at planning time (PartitionFilters, not a post-scan filter)."""
    out = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan, plan
    assert "PartitionFilters: []" not in plan, plan  # pruning actually applied
    # only the purchase partition is read
    assert df.count() == e.filter(F.col("event_type") == "purchase").count()


def test_codegen_engaged(spark, sf_dir):
    from datalake_worker_spark.plans.inspect import final_plan

    df = REGISTRY["q01_pricing_summary"].spark_fn(spark, sf_dir)
    plan = final_plan(df)
    # "*(n)" prefixes mark whole-stage-codegen stages in the simple plan
    assert "WholeStageCodegen" in plan or "*(" in plan, plan


def test_tpch_full_dims_broadcast_q07(spark, sf_dir):
    """Q7's five dims (supplier, both nation sides) broadcast; only the
    fact-fact joins (orders, customer chains) may shuffle."""
    df = REGISTRY["q07_volume_shipping"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_q17_correlated_avg_decorrelated_single_scan_shape(spark, sf_dir):
    """The correlated per-part average is decorrelated into one aggregate
    joined back — the plan must not contain a nested-loop subquery."""
    df = REGISTRY["q17_small_quantity_revenue"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q21_single_window_shuffle(spark, sf_dir):
    """Both EXISTS are folded into one window pass: one exchange on
    l_orderkey (plus the tiny supplier broadcast), not three self-joins."""
    df = REGISTRY["q21_last_shipper"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert uses_broadcast_join(df), plan
    # window on l_orderkey + final tiny groupBy = 2 DATA shuffles
    # (broadcast exchanges of the dims don't move fact data)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_q13_outer_join_preserved(spark, sf_dir):
    """The 0-order customers must survive: plan keeps an outer join (no
    accidental inner-conversion by the filter pushdown)."""
    plan = simple_plan(REGISTRY["q13_customer_order_distribution"].spark_fn(spark, sf_dir))
    assert "LeftOuter" in plan or "RightOuter" in plan, plan


def test_smp05_quota_broadcast(spark, sf_dir):
    """Per-language quotas join back as a broadcast (5 rows), not a shuffle."""
    df = REGISTRY["smp05_temperature_resample"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_minhash_collapse_no_text_shuffle(spark, sf_dir):
    """d04's exchanges must never carry the text column: the exact-dup
    collapse rides the signature shuffle (sha + 64 longs), and
    verification tokens join by id."""
    from datalake_worker_spark.plans.inspect import formatted_plan as fp

    df = REGISTRY["d04_minhash_near_dups"].spark_fn(spark, sf_dir)
    plan = fp(df)
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "text#" not in line, line


def test_smp06_hash_split_narrow(spark, sf_dir):
    """Split assignment is a pure projection: zero exchanges, and the
    scan reads only the two referenced columns."""
    df = REGISTRY["smp06_hash_split"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) == 0, simple_plan(df)
    assert set(read_schema_columns(df)) == {"doc_id", "n_chars"}


def test_t14_segment_dedup_two_phase_and_hashed_keys(spark, sf_dir):
    """The duplicate count must aggregate partially before its exchange
    (O(1) state per key — the giant-key guarantee), and both wide edges
    key on the sha2 hash, never on raw segment text. Exactly two corpus
    explodes (dup branch + probe branch) — the documented re-scan-over-
    reshuffle trade in segment_dedup's docstring."""
    df = REGISTRY["t14_segment_dedup"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert plan.count("Generate posexplode") == 2, plan
    assert "partial_count" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "seg#" not in line.split("hashpartitioning", 1)[1][:60], line


def test_d09_decontamination_benchmark_collapsed(spark, sf_dir):
    """The benchmark side must be DISTINCT-collapsed to its vocabulary
    before the gram join (broadcast at test scale)."""
    df = REGISTRY["d09_benchmark_decontamination"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_a11_hll_two_phase(spark, sf_dir):
    """Sketches build map-side (partial_hll_sketch_agg) — the property
    that makes distinct-counting mergeable at 100 TB."""
    df = REGISTRY["a11_hll_distinct_rollup"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert "partial_hll_sketch_agg" in plan, plan
    assert "hll_union_agg" in plan, plan


def test_bucketed_join_no_exchange(spark, sf_dir):
    """io06: both sides bucketed on the join key — the sort-merge join
    must run with zero exchanges before the (different-key) final agg."""
    from datalake_worker_spark.sources.roundtrip import _bucketed_table
    import hashlib

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    _bucketed_table(
        spark,
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        f"dlw_bkt_orders_{tag}", 8, "o_custkey",
    )
    _bucketed_table(
        spark,
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        f"dlw_bkt_customer_{tag}", 8, "c_custkey",
    )
    bo = spark.table(f"dlw_bkt_orders_{tag}")
    bc = spark.table(f"dlw_bkt_customer_{tag}")
    joined = bo.hint("merge").join(bc, bo["o_custkey"] == bc["c_custkey"])
    plan = simple_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert shuffle_count(joined) == 0, plan


def test_t18_chunking_no_shuffle(spark, sf_dir):
    """Chunking must be a pure narrow map — tokenize + posexplode with
    zero exchanges, or it can't feed a 100 TB embedding job cheaply."""
    df = REGISTRY["t18_document_chunking"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) == 0, formatted_plan(df)


def test_d14_bloom_probe_before_shuffle(spark, sf_dir):
    """The bloom pass must not join against the vocabulary: no join
    operator at all, exactly one exchange (the survivors' dedup/agg),
    and the bitmap shipped as a literal inside the filter."""
    df = REGISTRY["d14_bloom_decontamination"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    # distinct + final agg share the same hash partitioning → 1 exchange
    # pair (distinct) + possibly a reused one for the agg
    assert shuffle_count(df) <= 2, plan


def test_d15_islands_only_duplicated_starts(spark, sf_dir):
    """d15's window stage must sit above the dup-gram semi/inner join —
    i.e. the sort for the island window happens after filtering to
    duplicated starts, not over the full gram stream."""
    df = REGISTRY["d15_duplicate_spans"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    # the gram-join output feeds the window; the window's sort keys are
    # (doc, pos) — present somewhere above a join in the tree
    assert plan.index("Window") < plan.index("Join"), (
        "island window should be downstream (printed above) of the "
        "dup-gram join:\n" + plan
    )


def test_w11_scd2_single_shuffle(spark, sf_dir):
    """Both SCD2 windows partition on user_id — one exchange total."""
    df = REGISTRY["w11_scd2_intervals"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_zorder_files_cluster_both_dimensions(spark, sf_dir, tmp_path):
    """The point of the Z-layout: per-file parquet min/max stats must
    cover a narrow slice of BOTH clustering columns. A single-column
    sort nails one dimension and leaves the other at ~full range."""
    import glob

    import pyarrow.parquet as pq

    from datalake_worker_spark.sources.roundtrip import zorder_write

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("order_epoch"),
    )

    def avg_file_coverage(path, col):
        files = sorted(glob.glob(path + "/part-*.parquet"))
        spans, lo_g, hi_g = [], None, None
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((lo, hi))
            lo_g = lo if lo_g is None else min(lo_g, lo)
            hi_g = hi if hi_g is None else max(hi_g, hi)
        full = hi_g - lo_g
        return sum((hi - lo) / full for lo, hi in spans) / len(spans), len(files)

    z = str(tmp_path / "zorder")
    zorder_write(o, ["o_custkey", "order_epoch"], z, n_files=8)
    lin = str(tmp_path / "linear")
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lin)
    )

    z_cust, nz = avg_file_coverage(z, "o_custkey")
    z_time, _ = avg_file_coverage(z, "order_epoch")
    l_cust, nl = avg_file_coverage(lin, "o_custkey")
    l_time, _ = avg_file_coverage(lin, "order_epoch")
    assert nz > 1 and nl > 1
    # linear: near-perfect on the sort column, useless on the other
    assert l_cust < 0.35
    assert l_time > 0.8
    # z-order: BOTH dimensions clustered well below full range
    assert z_cust < 0.75, (z_cust, z_time)
    assert z_time < 0.75, (z_cust, z_time)
    # and the second dimension beats the linear layout decisively
    assert z_time < l_time - 0.2


def test_x06_nearest_single_shuffle(spark, sf_dir):
    """Backward and forward frames share one (user_id, ordering) —
    nearest as-of must keep x01's single-Exchange shape."""
    df = REGISTRY["x06_asof_join_nearest"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_twap_single_shuffle(spark, sf_dir):
    """TWAP: the lead window and the per-user aggregate share ONE
    exchange on user_id."""
    df = REGISTRY["w13_time_weighted_average"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) <= 1, simple_plan(df)


def test_ohlc_single_shuffle(spark, sf_dir):
    """OHLC bars: window endpoints and the bar aggregate share ONE
    exchange on (user_id, day) — requires projecting the bar key before
    the window (partitioning-reuse gate)."""
    df = REGISTRY["w14_ohlc_bars"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) <= 1, simple_plan(df)


def test_distributed_percent_rank_matches_window(spark):
    """The range-partition + offsets recipe must equal the unpartitioned
    percent_rank window bit-for-bit (unique total order)."""
    from pyspark.sql import Window as W

    from datalake_worker_spark.operators.windows import distributed_percent_rank

    rows = [(i, float((i * 37) % 19)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r.id: r.pr
        for r in distributed_percent_rank(df, order, n_parts=7).collect()
    }
    want = {
        r.id: r.pr
        for r in df.select(
            "id", F.percent_rank().over(W.orderBy(*order)).alias("pr")
        ).collect()
    }
    assert got == want


def test_catalog_find_df_pushdown_at_5k_chunks(spark, tmp_path):
    """The catalog's DataFrame lookup path must stay a pruned parquet
    scan as the metadata log grows: containment predicates reach
    PushedFilters (block range min/max prune row groups), and the
    result matches the Python-side fold."""
    from datalake_worker_spark.catalog import ChunkCatalog, ChunkMeta

    cat = ChunkCatalog(spark, str(tmp_path / "cat"))
    n = cat.register_chunks(
        [
            ChunkMeta("ds", f"c{i:05d}", i * 100, (i + 1) * 100, {}, 1)
            for i in range(5000)
        ]
    )
    assert n == 5000
    df = cat.find_chunks_df("ds", 123_456)
    assert has_pushed_filters(df), formatted_plan(df)
    rows = df.collect()
    assert [r["chunk_id"] for r in rows] == ["c01234"]
    assert cat.find_chunk_meta("ds", 123_456).chunk_id == "c01234"


def test_st13_history_probe_no_state_shuffle(spark, tmp_path):
    """The incremental-dedup history probe must broadcast the BATCH side
    into both joins so the accumulated state is probed map-side: no
    sort-merge/shuffled-hash join of history, and the band-state scan
    reads only the probe columns (doc_id, band_idx, band_hash)."""
    from datalake_worker_spark.streaming.incdedup import (
        EpochStore,
        K,
        history_drops,
    )

    sig_val = F.array(*[F.lit(i).cast("long") for i in range(K)])
    hist = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("band_idx"),
        F.xxhash64("id").alias("band_hash"),
    )
    bands_store = EpochStore(str(tmp_path / "bands"), ["band_idx", "band_hash"])
    sigs_store = EpochStore(str(tmp_path / "sigs"), ["doc_id"])
    bands_store.write_epoch(hist, 0)
    sigs_store.write_epoch(
        spark.range(200).select(F.col("id").alias("doc_id"), sig_val.alias("sig")), 0
    )
    batch_bands = spark.range(1000, 1005).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("band_idx"),
        F.xxhash64("id").alias("band_hash"),
    )
    batch_sig = spark.range(1000, 1005).select(
        F.col("id").alias("doc_id"), sig_val.alias("sig")
    )
    out = history_drops(
        batch_bands, batch_sig,
        bands_store.read(spark), sigs_store.read(spark),
    )
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # column pruning on the state scans: bands scan must not read `sig`,
    # sig scan must not read band columns
    assert "ReadSchema" in plan


def test_w15_funnel_single_user_exchange(spark, sf_dir):
    """The 3-step funnel's dependent conditional-MIN windows and the
    per-user collapse must all share ONE user-keyed Exchange; only the
    final global step-count aggregate adds a second (single-partition,
    partial-rows-only) one. The naive k-step funnel is k-1 self-joins."""
    df = REGISTRY["w15_funnel_steps"].spark_fn(spark, sf_dir)
    assert shuffle_count(df) <= 2, formatted_plan(df)
    assert "Join" not in simple_plan(df)


def test_w16_mad_group_constants_broadcast(spark, sf_dir):
    """The MAD gate's two group-constant tables (median, MAD — one row
    per event_type) must broadcast onto the fact scan, never sort-merge
    with it."""
    df = REGISTRY["w16_mad_outliers"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_j12_range_join_is_equi_shaped(spark, sf_dir):
    """The binned range self-join must plan as a hash/sort-merge
    EQUI-join on (user_id, probe_bin) — never the per-user-quadratic
    BroadcastNestedLoop a raw BETWEEN self-join produces."""
    df = REGISTRY["j12_binned_range_join"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_w17_rolling_median_single_exchange(spark, sf_dir):
    """The constant-frame exact median is one window pass: exactly one
    exchange (hashpartitioning on user_id), no joins."""
    df = REGISTRY["w17_rolling_median"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    # detail sections repeat node names — count operator-tree lines only
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan


def test_x08_overlap_join_is_equi_shaped(spark, sf_dir):
    """The interval-overlap join must meet on the bin equi-key (hash
    join), never BroadcastNestedLoop/cartesian — the whole point of the
    bin recipe is surviving two large sides."""
    df = REGISTRY["x08_interval_overlap_join"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or (
        "SortMergeJoin" in plan
    ), plan


def test_w18_sweep_line_single_exchange(spark, sf_dir):
    """The sweep-line concurrency op is one window pass over the
    unioned point stream: exactly one hashpartitioning exchange on the
    partition key (union is exchange-free), no joins."""
    df = REGISTRY["w18_max_concurrent_intervals"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    # exactly one exchange node in the tree; the aggregate reuses the
    # window's partitioning rather than reshuffling
    import re

    ex_nodes = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(ex_nodes) == 1, plan


def test_spread_scan_adaptive(spark, sf_dir):
    """spread_scan parallelizes ONLY sub-core-count inputs above the
    size floor: a single-file scan of a corpus-scale table gains
    partitions; an input already at/above the session default comes
    back unchanged (same plan object — no shuffle inserted); and a tiny
    dimension table stays unchanged regardless of its partition count
    (r14 floor, VERDICT r13 item 7)."""
    from datalake_worker_spark.sources import load_table, spread_scan
    from datalake_worker_spark.sources.readers import (
        _SPREAD_MIN_BYTES,
        _SPREAD_MIN_BYTES_PER_PART,
    )

    target = spark.sparkContext.defaultParallelism
    floor = max(_SPREAD_MIN_BYTES, _SPREAD_MIN_BYTES_PER_PART * target)
    # embeddings is the largest fixture at every SF; the spread fires
    # iff its estimate clears the floor (at sf0.001 on 32 cores it does)
    e = load_table(spark, sf_dir, "embeddings")
    est = int(e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est >= floor:
        assert e.rdd.getNumPartitions() < target  # single unsplittable file
        spread = spread_scan(e, "vec_id")
        assert spread.rdd.getNumPartitions() == target
        # deterministic hash layout, not round-robin
        assert "RoundRobin" not in spread._jdf.queryExecution().toString()
        wide = e.repartition(target, "vec_id")
        assert spread_scan(wide, "vec_id") is wide  # no-op above the bound

    # a tiny dimension table is NEVER repartitioned: the shuffle cannot
    # pay for itself below the floor
    n = load_table(spark, sf_dir, "nation")
    assert spread_scan(n, "n_nationkey") is n


def test_io24_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """The fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — runtime directory pruning from the broadcast
    dim, not a post-scan filter (r11)."""
    from datalake_worker_spark.registry import REGISTRY

    df = REGISTRY["io24_dynamic_partition_pruning"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), plan
    rows = df.collect()
    assert len(rows) == 2  # the rank filter keeps a proper subset


def test_a19_probe_joins_counters_broadcast(spark, sf_dir):
    """a19's estimate probe must broadcast the bounded counter frame
    (<= depth*width rows) — the corpus never shuffles for estimates."""
    df = REGISTRY["a19_cms_audit"].spark_fn(spark, sf_dir)
    assert uses_broadcast_join(df), simple_plan(df)


def test_d20_no_cartesian_product(spark, sf_dir):
    """The SimHash audit's candidate stage is the banded equi-join
    machinery — never a cross/nested-loop pair scan."""
    df = REGISTRY["d20_simhash_audit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan


def test_d21_no_cartesian_product(spark, sf_dir):
    """Same contract for the MinHash audit: band equi-join + candidate
    verify joins only, no all-pairs operator anywhere in the plan."""
    df = REGISTRY["d21_minhash_audit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan


def test_t34_histogram_partial_aggregation(spark, sf_dir):
    """t34's per-(feature,value) histogram must partial-aggregate
    map-side — the property that keeps the binned split search one
    combinable pass at any corpus size."""
    from datalake_worker_spark.operators.wave12 import _t33_features

    feat = _t33_features(load_table(spark, sf_dir, "documents"))
    per_val = feat.select(
        "y", F.lit("n_chars").alias("feature"), F.col("n_chars").alias("x")
    ).groupBy("feature", "x").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("c1")
    )
    assert "partial" in simple_plan(per_val).lower()


def test_d22_probe_is_map_side_filter(spark, sf_dir):
    """d22 (like d14): the Bloom probe is a scan-side Filter over the
    bitmap literal — the only join in the plan is the final survivors
    aggregation path, never a corpus-vs-vocabulary join."""
    df = REGISTRY["d22_bloom_audit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).lower()
    assert "join" not in plan, plan


def test_t36_winnowing_is_join_free(spark, sf_dir):
    """t36's whole pipeline is explode -> window MIN -> distinct ->
    agg: no join anywhere — the property that makes winnowing a
    map-side + one-exchange pass at any corpus size."""
    df = REGISTRY["t36_winnow_audit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).lower()
    assert "join" not in plan, plan


def test_w20_windows_share_one_sort(spark, sf_dir):
    """w20's two ignorenulls passes (last-before / first-after) share
    the same (user_id, h) partitioning+ordering, so Catalyst must fuse
    them into ONE Window node over ONE sort — never a second exchange
    or a self-join."""
    df = REGISTRY["w20_linear_interpolation"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    # count Window NODES (the node detail mentions windowspecdefinition
    # once per expression — match the operator line, not the text)
    assert plan.count("+- Window ") == 1, plan
    assert "cartesianproduct" not in plan.lower()


def test_m09_no_cartesian_product(spark, sf_dir):
    """The pHash audit's candidate stage is the banded equi-join
    machinery (d20's contract applied to the media column)."""
    df = REGISTRY["m09_phash_audit"].spark_fn(spark, sf_dir)
    plan = simple_plan(df).lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan


def test_a20_registers_partial_aggregate(spark, sf_dir):
    """a20's register MAX must partial-aggregate map-side — the
    mergeable-sketch property expressed in the plan: per-partition
    registers combine without re-scanning tokens."""
    df = REGISTRY["a20_hll_audit"].spark_fn(spark, sf_dir)
    assert "partial" in simple_plan(df).lower()


def test_d07_gram_frame_persisted_gate(spark, sf_dir):
    """r14 gate (VERDICT r13 item 9): d07's shared gram frame must stay
    persisted — it feeds FOUR consumers (df table, ranked prefixes,
    sizes, both verify sides), and removing the persist silently
    reintroduces duplicate tokenize/shingle passes. Red when the
    setsim.py persist is removed: the plan then has no cached relation
    and its exchange count grows past the r13 bound."""
    df = REGISTRY["d07_ssjoin_prefix"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryRelation" in plan, plan[:2000]
    import re

    ex_nodes = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(ex_nodes) <= 35, f"{len(ex_nodes)} exchanges: {sorted(ex_nodes)}"


@pytest.mark.parametrize("name", ["v15_ivf_audit", "v16_ivfpq_audit"])
def test_kmeans_dists_persisted_gate(spark, sf_dir, name):
    """r14 gate (VERDICT r13 item 9): v15/v16 persist the shared
    _km_dists frame (feeds the corpus assignment AND the query probes).
    The returned plan must read a cached relation whose output carries
    the k distance columns (d0..d3); removing the persist drops that
    cached node and recomputes the distance aggregation per subtree."""
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    import re

    # an InMemoryTableScan whose Output block lists the distance cols
    scans = re.findall(
        r"\(\d+\) InMemoryTableScan[^(]*\nOutput \[\d+\]: \[([^\]]*)\]",
        plan,
    )
    assert any("d0#" in s and "d3#" in s for s in scans), plan[:3000]


def test_d04_shared_input_persisted_gate(spark, sf_dir):
    """r14 gate: d04's spread corpus input must stay persisted — it
    feeds two separate jobs (the signature fold and the verify-side
    shingle projection), and removing the persist silently reintroduces
    the duplicate scan + spread exchange (profiled as two identical
    850 KB exchange writes per call). Red when the dedup.py persist is
    removed: the returned plan then has no cached relation."""
    df = REGISTRY["d04_minhash_near_dups"].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryRelation" in plan, plan[:2000]
