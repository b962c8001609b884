"""SparkSession factory tuned for this engine.

Local mode is the test bed; the config choices are the ones that scale:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for any pandas-UDF path, UTC session timezone for deterministic
timestamp semantics, and shuffle partitions sized to the environment
instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datalake_worker_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` takes any Spark master URL verbatim (cluster deployments);
    without it, ``cpus`` picks local[N]. Every other config below is what
    we would ship at 100 TB (AQE on, Arrow on, UTC, explicit shuffle
    parallelism).
    """
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # some sources write TIMESTAMP(NANOS) parquet (e.g. pandas/arrow
        # defaults); Spark has no nanos timestamp — read as long + convert
        # in the loader (sources/readers.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # every read path shares one timestamp semantics: never infer
        # TIMESTAMP_NTZ for isAdjustedToUTC=false parquet, including reads
        # that bypass load_table (landing-dir inference, catalog folds) —
        # matches ensure_session_confs (sources/readers.py)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # write micros (the annotated int64 type), not legacy INT96:
        # INT96 round-trips as timestamp[ns] through Arrow readers, which
        # external tools (and our own nanos detection) then mis-classify
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    # opt-in production state backend (streaming/statestore.py): RocksDB
    # keeps stateful-operator state on local disk instead of executor
    # heap — the 100 TB setting, and the Spark analogue of the
    # reference's RocksDB storage engine. rocksdbjni ships in pyspark's
    # jars, so no classpath gate is needed.
    state_store = os.environ.get("SPARK_GRAFT_STATE_STORE", "")
    if state_store:
        from .streaming.statestore import ROCKSDB_PROVIDER

        provider = (
            ROCKSDB_PROVIDER if state_store.lower() == "rocksdb" else state_store
        )
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_cached_state(spark: SparkSession) -> int:
    """Long-session cache janitor: unpersist every persistent RDD and
    clear the SQL cache. Several operators legitimately return plans
    whose persisted/localCheckpoint blocks must outlive the call (the
    caller reads them) — the blocks are reclaimed lazily by GC +
    ContextCleaner, which is fine for short sessions but accumulates
    across hundreds of corpus-scale queries in one long-lived JVM (the
    full-surface 10x sweep OOMed a 64 g heap on exactly this). A query
    runner that is DONE consuming each result calls this between
    queries; returns the number of RDDs released."""
    jsc = spark.sparkContext._jsc
    m = jsc.getPersistentRDDs()
    n = 0
    for rdd in list(m.values()):
        rdd.unpersist(False)
        n += 1
    spark.catalog.clearCache()
    return n
