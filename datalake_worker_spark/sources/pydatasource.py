"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a CHUNK-MANIFEST reader.

The reference's unit of data is a chunk with a ``files`` manifest
(name -> location, /root/reference/src/lib.rs:24-27). This source makes
that manifest a first-class Spark relation: the caller resolves a chunk
through the catalog (find -> pin -> chunk_path, the lk05 lifecycle) and
hands the file list to ``spark.read.format("dlw_chunk_manifest")``.
Planning splits the manifest into ONE InputPartition PER PARQUET ROW
GROUP — the same parallelism contract as Spark's native parquet reader,
so a 1000-file chunk scans wide without any Spark-side file listing —
and each partition yields Arrow RecordBatches straight from pyarrow
(zero per-row Python; the Arrow batches cross into the JVM columnar).

Scale notes: partitions() runs driver-side and touches only parquet
FOOTERS (one metadata read per file); the data path is executor-side
pyarrow with column pruning pushed into ``read_row_group(columns=...)``
(projection pushdown — the source never materializes unread columns).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class ChunkManifestDataSource(DataSource):
    """``format("dlw_chunk_manifest")`` options:

    - ``files``: comma-separated parquet files or directories (a chunk's
      manifest values; directories expand to their ``*.parquet`` members)
    - ``schema_ddl``: DDL of the columns to read (projection — only
      these columns are decoded)
    """

    @classmethod
    def name(cls) -> str:
        return "dlw_chunk_manifest"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema) -> "ChunkManifestReader":
        return ChunkManifestReader(self.options, schema)


def _expand(entry: str) -> list[str]:
    if os.path.isdir(entry):
        return sorted(
            os.path.join(entry, f)
            for f in os.listdir(entry)
            if f.endswith(".parquet")
        )
    return [entry]


class ChunkManifestReader(DataSourceReader):
    def __init__(self, options, schema):
        self.files = [
            f for e in options["files"].split(",") for f in _expand(e)
        ]
        self.columns = [f.name for f in schema.fields]

    def partitions(self):
        import pyarrow.parquet as pq

        parts = []
        for p in self.files:
            n_rg = pq.ParquetFile(p).metadata.num_row_groups
            parts.extend(_RowGroupPartition(p, rg) for rg in range(n_rg))
        return parts

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(
            partition.row_group, columns=self.columns
        )
        yield from table.to_batches()


def ensure_registered(spark) -> None:
    """Register the source on this session. Registration replaces any
    previous binding (verified: double-register logs a benign WARN),
    so no session-identity cache is needed — an id(spark) cache could
    mis-skip after a stopped session's id is reused."""
    spark.dataSource.register(ChunkManifestDataSource)


class ChunkReplayStreamReader(DataSourceStreamReader):
    """Streaming half of the manifest source: replays a chunk's parquet
    ROW GROUPS as stream offsets. The offset is a plain dict
    ``{"rg": n}`` — row groups [start, end) form one batch with one
    InputPartition each, so a chunk ingests as a bounded, resumable
    stream (the reference's download-chunk ingest loop expressed as a
    Structured Streaming source).

    latestOffset deliberately jumps straight to the manifest's total:
    ``Trigger.AvailableNow`` calls latestOffset ONCE and terminates at
    that offset, so a cursor-advancing implementation (one row group
    per call) SILENTLY DROPS everything after the first batch — probed
    and confirmed on this Spark build (4-row-group file, availableNow,
    cursor variant returned 25 of 100 rows). Incremental replay
    belongs to processingTime triggers, where repeated latestOffset
    calls page through naturally; on this harness every stream runs
    availableNow, so the whole manifest is one exactly-once batch and
    restart resumability comes from the checkpointed offset."""

    def __init__(self, options, schema):
        self.files = [
            f for e in options["files"].split(",") for f in _expand(e)
        ]
        self.columns = [f.name for f in schema.fields]
        import pyarrow.parquet as pq

        self.rg_index: list[tuple[str, int]] = []
        for p in self.files:
            for rg in range(pq.ParquetFile(p).metadata.num_row_groups):
                self.rg_index.append((p, rg))

    def initialOffset(self) -> dict:
        return {"rg": 0}

    def latestOffset(self) -> dict:
        return {"rg": len(self.rg_index)}

    def partitions(self, start: dict, end: dict):
        return [
            _RowGroupPartition(*self.rg_index[i])
            for i in range(start["rg"], end["rg"])
        ]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(
            partition.row_group, columns=self.columns
        )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are pure positions into an immutable manifest


class ChunkReplayStreamSource(DataSource):
    """``readStream.format("dlw_chunk_replay")`` — same options as
    the batch manifest source."""

    @classmethod
    def name(cls) -> str:
        return "dlw_chunk_replay"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def streamReader(self, schema) -> ChunkReplayStreamReader:
        return ChunkReplayStreamReader(self.options, schema)


def ensure_stream_registered(spark) -> None:
    spark.dataSource.register(ChunkReplayStreamSource)
