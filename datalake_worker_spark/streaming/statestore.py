"""RocksDB state store provider — the production state backend.

The reference keeps ALL its chunk state in RocksDB
(/root/reference/src/rocksdb_storage_engine.rs:16-19); Spark's
equivalent for streaming state is the RocksDB state store provider,
which moves per-key state out of the executor JVM heap into native
RocksDB instances (memtable + SST files), checkpointed to the stream's
checkpoint location. At 100 TB the default HDFS-backed in-memory
provider holds every open key in executor heap — a watermark spike or
a high-cardinality key space then OOMs the executor; RocksDB keeps the
working set on local disk with compaction, so state scales with local
SSD instead of heap (SURVEY.md §7 M4's promised "apt nod to the
reference's backend").

``rocksdbjni`` ships inside pyspark's own jars directory, so this is
NOT classpath-gated: every stateful operator in this repo (watermarked
windows/dedup, stream-stream joins, applyInPandasWithState) runs under
it unchanged — asserted by tests/test_rocksdb_statestore.py, which
re-runs st04/st06/st12 under RocksDB and requires results identical to
the default provider, plus RocksDB-specific progress metrics and SST
files in the checkpoint as proof of engagement.

Opt-in, two ways:
  - per-query/scope: ``with rocksdb_state_store(spark): ...``
  - session-wide: ``SPARK_GRAFT_STATE_STORE=rocksdb`` before
    ``get_spark()`` (session.py reads it), the deployment path.

The provider is pinned per-query at first start (recorded in the
checkpoint's offset log); flipping the conf mid-stream does not migrate
existing checkpoints — hence the scoped context manager rather than a
mutable global.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

STATE_STORE_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
#: Spark's default (heap-backed, HDFS-checkpointed) provider
DEFAULT_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


@contextmanager
def rocksdb_state_store(spark: SparkSession):
    """Scope the RocksDB state store provider to a block: every
    streaming query STARTED inside the block pins RocksDB in its
    checkpoint; the previous session setting is restored on exit."""
    try:
        prev = spark.conf.get(STATE_STORE_CONF)
    except Exception:  # noqa: BLE001 - unset
        prev = None
    spark.conf.set(STATE_STORE_CONF, ROCKSDB_PROVIDER)
    try:
        yield spark
    finally:
        if prev is not None:
            spark.conf.set(STATE_STORE_CONF, prev)
        else:
            spark.conf.unset(STATE_STORE_CONF)


def rocksdb_metrics(progress: dict) -> dict:
    """RocksDB-specific custom metrics from a streaming query's
    ``lastProgress`` — non-empty iff the provider actually engaged
    (the engagement proof used by the tests)."""
    out = {}
    for op in progress.get("stateOperators", []):
        for k, v in (op.get("customMetrics") or {}).items():
            if "rocksdb" in k.lower():
                out[k] = v
    return out
