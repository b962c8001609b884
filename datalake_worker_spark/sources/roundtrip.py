"""Source/sink round-trip queries (SURVEY.md §2.2 "sources/sinks"):
Parquet (partitioned write), CSV, JSON — each written by the engine,
read back by the engine, and verified against the original table via
the oracle (round-trip identity)."""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..scratch import scratch_dir
from ..registry import register
from ..sources import load_table
from .readers import read_csv, read_json, write_parquet


@register(
    "io01_parquet_roundtrip_partitioned",
    """
    SELECT o_orderstatus, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    """,
    category="sources",
    doc="partitioned parquet write (partitionBy status) → read back → identity.",
)
def io01_parquet_roundtrip_partitioned(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", F.col("o_totalprice").cast("double")
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "orders_part")
    write_parquet(o, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    # partition column comes back as the partition value — same data
    return back.select("o_orderstatus", "o_orderkey", "o_totalprice")


@register(
    "io02_csv_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    category="sources",
    doc="CSV sink + schema'd CSV source (no inference) → identity.",
)
def io02_csv_roundtrip(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "nation_csv")
    n.write.mode("overwrite").option("header", True).csv(out)
    return read_csv(spark, out, n.schema, header=True)


@register(
    "io03_json_roundtrip",
    """
    SELECT r_regionkey, r_name FROM region
    """,
    category="sources",
    doc="JSON-lines sink + schema'd JSON source → identity.",
)
def io03_json_roundtrip(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "region_json")
    r.write.mode("overwrite").json(out)
    return read_json(spark, out, r.schema)


@register(
    "io04_in_memory_source",
    """
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) t(id, tag)
    """,
    category="sources",
    doc="in-memory (createDataFrame / VALUES) source.",
)
def io04_in_memory_source(spark, sf_dir):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, tag string"
    )


def _bucketed_table(spark, df, name: str, n_buckets: int, key: str) -> None:
    """Materialize ``df`` as a bucketed+sorted table (idempotent per
    session). ``bucketBy`` requires the table-catalog write path; the
    data lands in an external temp dir, only metadata hits the catalog."""
    if not spark.catalog.tableExists(name):
        (
            df.write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", os.path.join(scratch_dir(prefix="dlw_bkt_"), name))
            .mode("overwrite")
            .saveAsTable(name)
        )


@register(
    "io06_bucketed_colocated_join",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    category="sources",
    doc=(
        "bucketed co-located join: both sides written bucketBy(8) on the "
        "join key, so the sort-merge join runs with ZERO exchanges (plan "
        "asserted in tests). At 100 TB this is the pattern for recurring "
        "fact-fact joins: pay the shuffle once at write time, never at "
        "read time."
    ),
)
def io06_bucketed_colocated_join(spark, sf_dir):
    import hashlib

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    t_o, t_c = f"dlw_bkt_orders_{tag}", f"dlw_bkt_customer_{tag}"
    _bucketed_table(
        spark,
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        t_o, 8, "o_custkey",
    )
    _bucketed_table(
        spark,
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        t_c, 8, "c_custkey",
    )
    bo, bc = spark.table(t_o), spark.table(t_c)
    # hint forces sort-merge (a broadcast would hide the bucketing); the
    # bucket layout makes it exchange-free
    joined = bo.hint("merge").join(bc, bo["o_custkey"] == bc["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "io05_schema_evolution_merge",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    category="sources",
    doc=(
        "parquet schema evolution: an old writer's files (2 columns) and "
        "a new writer's files (3 columns) read as ONE dataset via "
        "mergeSchema — missing columns surface as NULL, no rewrite of "
        "historical data. The oracle is the equivalent UNION with NULL "
        "padding."
    ),
)
def io05_schema_evolution_merge(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    root = os.path.join(scratch_dir(prefix="dlw_io_"), "orders_evolved")
    # "old" files: narrow schema
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    ).write.mode("overwrite").parquet(os.path.join(root, "v1"))
    # "new" files: a column was added
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(root, "v2"))
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "v1"), os.path.join(root, "v2")
    )


def merge_upsert(target, changes, key: str, set_cols: dict[str, str]):
    """Apply a CDC change feed to a snapshot — MERGE INTO semantics as
    ONE full-outer join (no table format required).

    ``changes`` must carry the join ``key``, an ``op`` column
    ('U' update / 'D' delete / 'I' insert), and the new-value columns
    named in ``set_cols`` (target column → change column). Matched 'D'
    rows drop, matched 'U' rows rewrite the mapped columns, unmatched
    'I' rows append (unmapped columns surface as NULL). Single shuffle
    on the key; bucket the target on the key (io06) to remove even that.
    """
    chg = changes.withColumnRenamed(key, "_mk")
    merged = target.join(chg, target[key] == F.col("_mk"), "full_outer")
    upserted = F.col("op").isin("U", "I")
    out_cols = []
    for c in target.columns:
        if c == key:
            out_cols.append(F.coalesce(F.col("_mk"), target[key]).alias(key))
        elif c in set_cols:
            out_cols.append(
                F.when(upserted, F.col(set_cols[c])).otherwise(target[c]).alias(c)
            )
        else:
            out_cols.append(target[c])
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        *out_cols
    )


@register(
    "io08_merge_upsert",
    """
    WITH chg AS (
        SELECT o_orderkey AS k, 'D' AS op,
               CAST(NULL AS VARCHAR) AS new_status, CAST(NULL AS DOUBLE) AS new_price
        FROM orders WHERE o_orderkey % 31 = 0
        UNION ALL
        SELECT o_orderkey, 'U', 'U', o_totalprice + 100.0
        FROM orders WHERE o_orderkey % 31 <> 0 AND o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'I', 'N', o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT CAST(COALESCE(c.k, t.o_orderkey) AS BIGINT) AS o_orderkey,
           CASE WHEN c.op IN ('U', 'I') THEN c.new_status
                ELSE t.o_orderstatus END AS o_orderstatus,
           CAST(CASE WHEN c.op IN ('U', 'I') THEN c.new_price
                     ELSE t.o_totalprice END AS DOUBLE) AS o_totalprice
    FROM orders t FULL OUTER JOIN chg c ON t.o_orderkey = c.k
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    category="sources",
    doc=(
        "lakehouse MERGE INTO (upsert) semantics without a table format: "
        "a change feed (insert/update/delete ops) applied to a snapshot "
        "via ONE full-outer join on the key — matched+D drops the row, "
        "matched+U rewrites it, unmatched+I appends. At 100 TB this is "
        "the single-shuffle CDC-apply pattern; with the target bucketed "
        "on the key (io06) the shuffle disappears entirely. Mirrors "
        "Delta/Iceberg MERGE (public spec) re-expressed as a plain join."
    ),
)
def io08_merge_upsert(spark, sf_dir):
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    deletes = t.filter(k % 31 == 0).select(
        k.alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("double").alias("new_price"),
    )
    updates = t.filter((k % 31 != 0) & (k % 7 == 0)).select(
        k.alias("k"),
        F.lit("U").alias("op"),
        F.lit("U").alias("new_status"),
        (F.col("o_totalprice") + 100.0).alias("new_price"),
    )
    inserts = t.filter(k % 97 == 0).select(
        (k + 10000000).alias("k"),
        F.lit("I").alias("op"),
        F.lit("N").alias("new_status"),
        F.col("o_totalprice").alias("new_price"),
    )
    chg = (
        deletes.unionByName(updates)
        .unionByName(inserts)
        .withColumnRenamed("k", "o_orderkey")
    )
    out = merge_upsert(
        t.withColumn("o_totalprice", F.col("o_totalprice").cast("double")),
        chg,
        "o_orderkey",
        {"o_orderstatus": "new_status", "o_totalprice": "new_price"},
    )
    return out.select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )


@register(
    "io07_orc_roundtrip",
    """
    SELECT s_suppkey, s_name, s_nationkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
    category="sources",
    doc=(
        "ORC sink + source (Spark-native, no extra jars) -> identity. "
        "Round-trip oracle reads the ORIGINAL table: equality proves the "
        "format preserved rows and types."
    ),
)
def io07_orc_roundtrip(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.col("s_acctbal").cast("double")
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "supplier_orc")
    s.write.mode("overwrite").orc(out)
    return spark.read.schema(s.schema).orc(out)


@register(
    "io09_sorted_compaction",
    """
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity,
           l_shipdate
    FROM lineitem
    """,
    category="sources",
    doc=(
        "compaction + clustered layout (the small-files fix): "
        "repartitionByRange on the filter key, sortWithinPartitions, "
        "zstd parquet with maxRecordsPerFile. Range layout gives every "
        "file a tight min/max band on l_orderkey, so row-group/file "
        "skipping serves point and range predicates without reading the "
        "rest; maxRecordsPerFile bounds file size regardless of "
        "partition skew. Identity oracle proves the rewrite is lossless."
    ),
)
def io09_sorted_compaction(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        "l_shipdate",
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "lineitem_compact")
    (
        li.repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", 50000)
        .parquet(out)
    )
    return spark.read.schema(li.schema).parquet(out)


@register(
    "io10_corrupt_json_handling",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN doc_id ELSE 0 END) AS BIGINT)
               AS good_id_sum
    FROM documents
    """,
    category="sources",
    doc=(
        "malformed-input resilience: a JSONL feed where every tenth "
        "record is truncated mid-object (planted deterministically) read "
        "under PERMISSIVE mode — bad lines land in _corrupt_record "
        "instead of failing the job, good rows parse normally. The "
        "oracle checks total/corrupt counts and the id-sum of the "
        "surviving rows. At 100 TB ingest this is the difference "
        "between quarantining 0.1% of a crawl and losing the batch; "
        "FAILFAST/DROPMALFORMED are the same reader one option away."
    ),
)
def io10_corrupt_json_handling(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "docs_jsonl")
    # plant: every 10th record loses its closing brace (truncated write)
    line = F.concat(
        F.lit('{"doc_id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.when(F.col("doc_id") % 10 == 0, F.lit('"')).otherwise(F.lit('"}')),
    )
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.schema("doc_id bigint, lang string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long"))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("doc_id")).otherwise(0))
        .cast("long")
        .alias("good_id_sum"),
    )


@register(
    "io11_dynamic_partition_overwrite",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderpriority = 'REWRITTEN' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rewritten
    FROM (
        SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderstatus, 'REWRITTEN' AS o_orderpriority
        FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0
    )
    GROUP BY o_orderstatus
    """,
    category="sources",
    doc=(
        "dynamic partition overwrite (partitionOverwriteMode=dynamic): a "
        "second write that produces only the 'F' partition replaces ONLY "
        "that partition — untouched partitions survive byte-for-byte, no "
        "read-modify-write of the table. This is the incremental-backfill "
        "primitive: at 100 TB you rewrite the day/segment that changed, "
        "never the table. Static mode (the default) would have dropped "
        "every other partition; the oracle encodes the expected merged "
        "state."
    ),
)
def io11_dynamic_partition_overwrite(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "orders_dyn")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
            .withColumn("o_orderpriority", F.lit("REWRITTEN"))
            .write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("o_orderpriority") == "REWRITTEN").cast("long"))
        .cast("long")
        .alias("n_rewritten"),
    )


@register(
    "io12_binaryfile_ingest",
    """
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents WHERE doc_id < 50
    """,
    category="sources",
    doc=(
        "binary-file ingestion front door (the multimodal asset path): "
        "payloads are written as loose .bin files by a distributed "
        "foreachPartition sink, then ingested with Spark's binaryFile "
        "source (pathGlobFilter-scoped), yielding (path, length, "
        "content) rows whose sha256 must round-trip exactly. At scale "
        "this is how image/audio blobs enter the lake before m01-m05 "
        "process them: the source parallelizes over files, prunes on "
        "path/length metadata, and never decodes payloads it drops. "
        "DEPLOYMENT NOTE: the foreachPartition sink runs on executors, "
        "so the landing dir MUST be a shared filesystem (NFS/object "
        "store mount) visible to both executors and the binaryFile "
        "read — a tempdir only works in local mode; on a cluster pass "
        "a shared root instead."
    ),
)
def io12_binaryfile_ingest(spark, sf_dir):
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    # local-mode landing dir; executors and driver share one filesystem
    # here. On a real cluster this must be a shared root (see doc note).
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "blobs")
    os.makedirs(out, exist_ok=True)

    def write_files(rows):
        for r in rows:
            p = os.path.join(out, f"doc_{r['doc_id']}.bin")
            tmp = p + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(bytes(r["payload"]))
            os.rename(tmp, p)  # rename-atomic, idempotent under retries

    d.foreachPartition(write_files)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return back.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.col("length").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha"),
    )


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    Z-order (Morton) key — static bit expressions, fully codegen'd."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out.bitwiseOR(
                F.call_function(
                    "shiftleft",
                    F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)),
                    F.lit(2 * i),
                )
            ).bitwiseOR(
                F.call_function(
                    "shiftleft",
                    F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)),
                    F.lit(2 * i + 1),
                )
            )
        )
    return out


def zorder_write(
    df, cols: list[str], out: str, n_files: int = 8, bits: int = 16
):
    """Write ``df`` laid out along a Z-order curve over two columns
    (Delta OPTIMIZE ZORDER analog): each column min-max-normalizes to
    ``bits`` bits (bounds from one metadata-scale aggregate), the Morton
    key interleaves them, and repartitionByRange + sortWithinPartitions
    on that key clusters rows so EVERY file covers a narrow range of
    BOTH columns — parquet min/max row-group stats then prune scans on
    either predicate. A single-column sort gives perfect pruning on one
    dimension and none on the other; the curve trades a little of each
    for pruning on both. One range shuffle, no skew (the key is
    near-uniform by construction)."""
    a, b = (F.col(c) for c in cols)
    bounds = df.agg(
        F.min(a).alias("_amin"),
        F.max(a).alias("_amax"),
        F.min(b).alias("_bmin"),
        F.max(b).alias("_bmax"),
    )
    scale = (1 << bits) - 1
    with_key = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        morton_key(
            (
                (a - F.col("_amin"))
                * scale
                / F.greatest(F.col("_amax") - F.col("_amin"), F.lit(1))
            ).cast("long"),
            (
                (b - F.col("_bmin"))
                * scale
                / F.greatest(F.col("_bmax") - F.col("_bmin"), F.lit(1))
            ).cast("long"),
            bits,
        ),
    )
    (
        with_key.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


@register(
    "io13_zorder_layout",
    """
    SELECT o_orderkey, o_custkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    """,
    category="sources",
    doc=(
        "Z-order layout rewrite (Delta OPTIMIZE ZORDER analog): orders "
        "clustered along a Morton curve over (o_custkey, o_orderdate) "
        "via one range shuffle, so parquet min/max stats prune scans on "
        "EITHER column; the companion pytest measures per-file range "
        "coverage of both dimensions against a single-column sort. "
        "Content round-trips exactly — layout is invisible to results."
    ),
)
def io13_zorder_layout(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("order_epoch"),
        F.col("o_totalprice").cast("double"),
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "orders_zorder")
    zorder_write(o, ["o_custkey", "order_epoch"], out)
    return spark.read.parquet(out)


@register(
    "io14_table_stats",
    """
    SELECT 'o_orderkey' AS col,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_non_null,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_v,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS DOUBLE),
           CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE),
           CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    """,
    category="sources",
    doc=(
        "ANALYZE-style column statistics (non-null/null counts, exact "
        "NDV, min/max) for the CBO/pruning decisions every lakehouse "
        "keeps per file and per table: one scan, all columns' moments "
        "computed together map-side, one tiny shuffle per distinct "
        "aggregate. At extreme NDV swap COUNT(DISTINCT) for the HLL "
        "sketch a11 maintains incrementally."
    ),
)
def io14_table_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for c in ("o_orderkey", "o_custkey", "o_totalprice"):
        parts.append(
            o.agg(
                F.lit(c).alias("col"),
                F.count(c).cast("long").alias("n_non_null"),
                (F.count("*") - F.count(c)).cast("long").alias("n_null"),
                F.count_distinct(F.col(c)).cast("long").alias("ndv"),
                F.min(c).cast("double").alias("min_v"),
                F.max(c).cast("double").alias("max_v"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "io15_snapshot_diff",
    """
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 3 != 0
    ),
    v2 AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0
                    THEN ROUND(CAST(o_totalprice AS DOUBLE) * 1.1, 2)
                    ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_totalprice != v2.o_totalprice
       OR v1.o_orderstatus != v2.o_orderstatus
    """,
    category="io",
    doc=(
        "snapshot diff (the Delta change-data-feed question answered "
        "relationally): two synthetic versions of orders — v2 drops "
        "some keys, adds others, and reprices every 7th — full-outer "
        "joined on the key and classified added/removed/changed, with "
        "unchanged rows (the overwhelming majority in practice) "
        "filtered out so only the change set leaves the join. Shape: "
        "ONE key-keyed shuffle join; on bucketed snapshot layouts "
        "(io06) it co-locates with zero Exchange, and comparing a "
        "precomputed row content-hash instead of N columns keeps the "
        "probe narrow at wide schemas. The migration-audit / "
        "incremental-sync primitive."
    ),
)
def io15_snapshot_diff(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    v1 = o.filter(F.col("o_orderkey") % 3 != 0)
    v2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.filter(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            change.alias("change"),
        )
    )


def expire_partitions(path: str, partition_col: str, keep_from: int) -> list[str]:
    """Data-retention TTL as a METADATA operation: drop every hive
    partition directory whose value sorts below ``keep_from`` without
    scanning a single data row — partition pruning's destructive twin.
    Returns the dropped partition values (sorted)."""
    import shutil

    dropped = []
    prefix = f"{partition_col}="
    for d in sorted(os.listdir(path)):
        if not d.startswith(prefix):
            continue
        v = d[len(prefix):]
        if v.isdigit() and int(v) < keep_from:
            shutil.rmtree(os.path.join(path, d))
            dropped.append(v)
    return dropped


@register(
    "io16_ttl_partition_expiry",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    WHERE year(o_orderdate) >= 1996
    GROUP BY o_year
    """,
    category="io",
    doc=(
        "TTL data retention on a partitioned layout: orders written "
        "partitioned by order year, then every partition older than the "
        "retention cutoff (1996) is expired by DIRECTORY deletion — a "
        "pure metadata operation, zero rows scanned or rewritten "
        "(partition pruning's destructive twin; what DELETE WHERE "
        "year < cutoff costs a full rewrite to express on unpartitioned "
        "data). The read-back per-year counts must equal the filtered "
        "batch aggregate. At 100 TB this is the difference between "
        "expiry in seconds and a multi-hour compaction; the chunk "
        "catalog's schedule_delete/vacuum is the same idea with leases."
    ),
)
def io16_ttl_partition_expiry(spark, sf_dir):

    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    root = scratch_dir(prefix="dlw_ttl_")
    path = os.path.join(root, "orders_by_year")
    o.write.partitionBy("o_year").mode("overwrite").parquet(path)
    expire_partitions(path, "o_year", 1996)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("o_year").cast("long").alias("o_year"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_orderkey").cast("long").alias("first_key"),
        )
    )


@register(
    "io17_jdbc_roundtrip",
    """
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
    category="sources",
    doc=(
        "REAL JDBC roundtrip — not a classpath stub: nation is written "
        "to an embedded Apache Derby database through the JDBC sink "
        "(Derby's driver ships inside the Spark distribution itself) "
        "and read back as a PARTITIONED JDBC scan (partitionColumn + "
        "bounds -> 4 parallel range queries, the only JDBC read shape "
        "that scales past one connection), then aggregated per region. "
        "Embedded Derby lives in the driver JVM — exactly the local[*] "
        "topology; on a cluster the identical code points at a network "
        "JDBC URL. Covers sources/connectors.py read_jdbc/write_jdbc "
        "(the reference's external-source ingest surface, "
        "src/lib.rs:17-28, re-expressed as a Spark connector)."
    ),
)
def io17_jdbc_roundtrip(spark, sf_dir):
    from .connectors import DERBY_EMBEDDED_DRIVER, read_jdbc, write_jdbc

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    dbdir = os.path.join(scratch_dir(prefix="dlw_jdbc_"), "db")
    url = f"jdbc:derby:{dbdir};create=true"
    write_jdbc(n, url, "NATION_RT", DERBY_EMBEDDED_DRIVER)
    back = read_jdbc(
        spark,
        url,
        "NATION_RT",
        DERBY_EMBEDDED_DRIVER,
        partitionColumn="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
    )
    back = back.select([F.col(c).alias(c.lower()) for c in back.columns])
    return back.groupBy("n_regionkey").agg(
        F.count("*").cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "io23_xml_roundtrip",
    """
    SELECT s_suppkey, s_name, s_nationkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
    category="sources",
    doc=(
        "XML sink + source (built into Spark 4 core — the spark-xml "
        "connector was merged upstream in 4.0; probed working in this "
        "container, unlike Avro whose spark-avro module jar is absent "
        "and stays classpath-gated with Delta/Iceberg) -> identity. "
        "rowTag-framed records, schema-on-read with the source schema "
        "pinned explicitly so numeric types survive the text format. "
        "Round-trip oracle reads the ORIGINAL table: equality proves "
        "the format preserved rows and types."
    ),
)
def io23_xml_roundtrip(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.col("s_acctbal").cast("double")
    )
    out = os.path.join(scratch_dir(prefix="dlw_io_"), "supplier_xml")
    s.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(out)
    return (
        spark.read.schema(s.schema)
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )


@register(
    "io24_dynamic_partition_pruning",
    """
    WITH dim AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_dim
        FROM orders GROUP BY o_orderpriority
        QUALIFY ROW_NUMBER() OVER (
            ORDER BY COUNT(*) DESC, o_orderpriority ASC) <= 2
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue
    FROM orders o JOIN dim USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
    category="sources",
    doc=(
        "DYNAMIC partition pruning (r11): orders written partitioned by "
        "o_orderpriority, then joined with a runtime-derived dim (the 2 "
        "highest-count priorities — a rank filter Catalyst cannot fold "
        "into a static predicate), so the fact scan's PartitionFilters "
        "carry a dynamicpruningexpression: only the surviving partition "
        "DIRECTORIES are read, decided at runtime from the broadcast "
        "dim. The static-pruning twin of io01's plan gate, and the "
        "mechanism that turns a 100 TB partitioned-fact join into a "
        "read of just the dim-selected partitions. Plan-gated in "
        "tests/test_plans.py; the DuckDB oracle replays the identical "
        "rank-derived dim + join."
    ),
)
def io24_dynamic_partition_pruning(spark, sf_dir):
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    out = os.path.join(scratch_dir(prefix="dlw_dpp_"), "orders_part")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)
    cnt = fact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_dim")
    )
    w = W.orderBy(F.col("n_dim").desc(), F.col("o_orderpriority").asc())
    dim = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_orderpriority", "n_dim")
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
