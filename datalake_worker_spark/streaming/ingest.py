"""Streaming ingest: the reference's S3 download loop re-expressed as
Structured Streaming (R1/R2, /root/reference/src/data_manager.rs:69-81,
:189-276).

The reference spawns N async tasks that each download one chunk, decode
it, and admit it to cache+storage with an idempotent vacancy check, a
size-cap check, and rollback on failure. Spark-native that is a file
readStream over a landing directory with ``foreachBatch``: each
micro-batch writes the chunk's Parquet data (write-then-register =
files land before the metadata row commits, mirroring the cache-rollback
ordering at src/data_manager.rs:263-274), then registers it in the
catalog — idempotent on chunk_id, cap-checked, MaxSizeAllocated on
overflow.

Object-store posture: ``landing_dir`` is any Hadoop-FS URI — the same
``readStream`` accepts ``s3a://bucket/landing`` unchanged (the file
source lists via the Hadoop FileSystem API; S3 credentials/committers
are cluster config, not code). This sandbox has no object store, so the
claim is exercised on local paths only; the rename-free pieces the S3
path needs — exclusive-create commits with the O_EXCL/copy fallback,
completion markers instead of atomic-rename assumptions — are the
catalog backend's tested behavior (catalog.py ``append_records``,
``aborted_top``).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import ChunkCatalog, ChunkMeta
from ..errors import MaxSizeAllocated


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def ingest_stream(
    spark: SparkSession,
    catalog: ChunkCatalog,
    landing_dir: str,
    schema,
    dataset_id: str,
    block_col: str,
    blocks_per_chunk: int = 1000,
    max_files_per_trigger: int = 4,  # the reference's 4 parallel downloads
):
    """Start a streaming ingest query: landing files → chunked parquet +
    catalog registration. Returns the StreamingQuery."""

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )

    def register_batch(df, epoch_id: int):
        # bucket rows into block ranges; one chunk per bucket per batch
        with_block = df.withColumn(
            "_block", (F.col(block_col) / blocks_per_chunk).cast("long")
        )
        buckets = [r["_block"] for r in with_block.select("_block").distinct().collect()]
        metas = []
        for b in sorted(buckets):
            part = with_block.filter(F.col("_block") == b).drop("_block")
            chunk_id = hashlib.sha256(
                f"{dataset_id}:{b}:{epoch_id}".encode()
            ).hexdigest()
            start, end = b * blocks_per_chunk, (b + 1) * blocks_per_chunk
            out_dir = os.path.join(
                catalog.root, "data", dataset_id, chunk_id
            )
            # 1. data files land first…
            part.write.mode("overwrite").parquet(out_dir)
            size = _dir_size(out_dir)
            metas.append(ChunkMeta(
                dataset_id=dataset_id,
                chunk_id=chunk_id,
                block_start=start,
                block_end=end,
                files={"part.parquet": out_dir},
                size_bytes=size,
            ))
        try:
            # 2. …then the whole batch's metadata commits as ONE log
            # version (bulk CAS — one file per micro-batch, not one per
            # bucket). Already-ACTIVE ids are skipped as no-ops: since
            # chunk_id is deterministic per (dataset, bucket, epoch), that
            # only happens on a foreachBatch REPLAY of a batch whose
            # register already committed. The overwrite above just
            # re-materialized the same rows at the same path the live
            # chunk's manifest points to, so the files must be LEFT alone
            # (deleting them would destroy an ACTIVE chunk's data).
            catalog.register_chunks(metas)
        except MaxSizeAllocated:
            # rollback analog (src/data_manager.rs:263-274): the bulk
            # admission is atomic, so NO metadata row was written — remove
            # every file dir this batch materialized whose chunk_id is
            # ENTIRELY absent from the catalog (no record in any
            # non-DELETED state), and re-raise. A replayed chunk a racer
            # moved to PENDING_DELETE is not ACTIVE but may still be
            # lease-pinned: its files belong to vacuum's lease-checked
            # delete path (R7 barrier), never to this rollback.
            catalog.refresh()
            present = catalog.registered_chunks()
            for meta in metas:
                if meta.chunk_id not in present:
                    catalog.backend.delete_chunk_files(
                        meta.files["part.parquet"]
                    )
            raise

    return (
        stream.writeStream.foreachBatch(register_batch)
        .option("checkpointLocation", os.path.join(catalog.root, "_checkpoints", dataset_id))
        .trigger(availableNow=True)
        .start()
    )
