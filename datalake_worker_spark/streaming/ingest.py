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
            # every file dir this batch materialized that is not backed by
            # an ACTIVE registration from an earlier commit, and re-raise
            catalog.refresh()
            active = set(catalog.list_chunks())
            for meta in metas:
                if meta.chunk_id not in active:
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
