"""Incremental (streaming) near-duplicate dedup — dedup-against-history.

The batch near-dup operators (d04/d13) answer "which documents in THIS
corpus duplicate each other"; a crawl ingestion pipeline needs the
incremental question: "is this NEW document a near-duplicate of
anything ever admitted?". The reference engine's ingest admits chunks
idempotently by id (src/data_manager.rs:226-228); this module is the
content-level analog for LLM training-data ingestion.

Spark-first shape: ``foreachBatch`` + a growing signature state table —
the idiomatic stream-vs-history pattern (stream-static join where the
static side accumulates). Per micro-batch:

1. MinHash signatures + LSH band hashes for the arriving docs (JVM
   expressions from ``functions.dedup`` — no Python in the hot path).
2. Within-batch dedup: exact (sha-group, min id wins — the
   mass-duplicate guard before any pair expansion) + LSH bucket-local
   near-pairs (greedy: a doc drops if it pairs with any smaller
   surviving-or-not id — deterministic, arrival-order free within the
   batch).
3. History dedup: band-hash equi-join against the state table gives
   candidates. Verification — within batch and against history — is
   MINHASH-SIGNATURE AGREEMENT (fraction of equal components estimates
   Jaccard): the state stores 64 longs per admitted doc, never text, so
   no check ever re-shuffles document bodies and ONE minhash pass per
   batch serves pairing, verification, and the state append.
4. Survivors append their bands+signatures to state; survivor ids land
   in an epoch-keyed output dir. All writes are ``epoch=N`` overwrites,
   so foreachBatch's at-least-once replay is idempotent (same recipe as
   ``streaming/rollup.py``).

100 TB posture: the state table is the only growing structure — bucket
it on (band_idx, band_hash) and the per-batch candidate join becomes a
co-located probe of a small broadcastable batch side against a pruned
state scan; signatures join by doc id. Nothing here collects to the
driver; epoch state transitions are file renames.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table
from ..functions.dedup import bands_from_signatures, minhash_signatures

K = 64
BANDS = 16
#: minimum fraction of equal minhash components (estimates Jaccard) for
#: a history candidate to count as a duplicate
AGREEMENT = 0.5


def stage_batches(root: str, batches: list[DataFrame], select_cols) -> str:
    """Stage each batch as one landing file, in list order (the file
    source triggers by (mod-time, path), so list order == arrival
    order). Shared by the foreachBatch harnesses (incdedup, vecindex)."""
    landing = os.path.join(root, "landing")
    os.makedirs(landing, exist_ok=True)
    for i, b in enumerate(batches):
        stage = os.path.join(root, f"_stage_{i}")
        b.select(*select_cols).coalesce(1).write.mode("overwrite").parquet(stage)
        part = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))[0]
        shutil.copy(
            os.path.join(stage, part),
            os.path.join(landing, f"batch_{i:04d}.parquet"),
        )
    return landing


def run_incremental_near_dup(
    spark: SparkSession,
    batches: list[DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    root: str | None = None,
) -> DataFrame:
    """Stage ``batches`` as one landing file each, stream them through
    the incremental dedup (one micro-batch per file, in list order), and
    return the admitted docs as (doc_id, epoch)."""
    root = root or tempfile.mkdtemp(prefix="dlw_incdup_")
    landing = stage_batches(
        root,
        batches,
        [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")],
    )
    state_bands = os.path.join(root, "state_bands")
    state_sigs = os.path.join(root, "state_sigs")

    def _agree(a, b):
        # fraction of equal minhash components ≈ Jaccard
        return F.size(
            F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda m: m)
        ) / F.lit(float(K))

    def dedup_batch(df: DataFrame, epoch_id: int) -> None:
        s = df.sparkSession
        e = int(epoch_id)
        # exact sha groups keep the min id — the mass-duplicate guard
        # (identical copies of a hot page must never reach the O(n²)
        # bucket-pair expansion; same reasoning as d13's exact collapse)
        sha_drop = (
            df.select("doc_id", F.sha2("text", 256).alias("_sha"))
            .withColumn("_min", F.min("doc_id").over(Window.partitionBy("_sha")))
            .filter(F.col("doc_id") > F.col("_min"))
            .select("doc_id")
        )
        live = df.join(sha_drop, "doc_id", "left_anti")
        # ONE minhash pass serves within-batch pairing, history
        # verification, and the state append; the signature is packed
        # into a single array<long> column immediately — the 64-column
        # layout bloats every downstream join plan (measured ~1 MB task
        # binaries and analysis-dominated batches at test scale)
        wide = minhash_signatures(live, "doc_id", "text", k=K)
        sig = wide.select(
            "doc_id", F.array(*[F.col(f"h{i}") for i in range(K)]).alias("sig")
        ).persist()
        bands = bands_from_signatures(wide, "doc_id", K, BANDS).persist()
        # within-batch near-pairs: bucket-local expansion (deterministic
        # cap like d04), verified by signature agreement; greedy drop of
        # the larger id
        buckets = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("all_ids"))
            .filter(F.size("all_ids") > 1)
            .select(F.slice("all_ids", 1, 200).alias("ids"))
        )
        near_drop = (
            buckets.select(F.explode("ids").alias("id_a"), "ids")
            .select("id_a", F.explode("ids").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
            .join(sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
            .join(sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
            .filter(_agree(F.col("sa"), F.col("sb")) >= AGREEMENT)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        survivors = live.join(near_drop, "doc_id", "left_anti")
        if os.path.isdir(state_bands):
            # STRICTLY EARLIER epochs only: an at-least-once replay of this
            # epoch would otherwise read its own first attempt's state,
            # self-match every admitted doc at agreement 1.0, and
            # overwrite the epoch's state with an empty set
            hist_b = (
                s.read.parquet(state_bands)
                .filter(F.col("epoch") < e)
                .select(F.col("doc_id").alias("old_id"), "band_idx", "band_hash")
            )
            cand = (
                bands.join(hist_b, ["band_idx", "band_hash"])
                .select("doc_id", "old_id")
                .distinct()
            )
            hist_sig = (
                s.read.parquet(state_sigs)
                .filter(F.col("epoch") < e)
                .select(F.col("doc_id").alias("old_id"), F.col("sig").alias("so"))
            )
            hist_drop = (
                cand.join(sig, "doc_id")
                .join(hist_sig, "old_id")
                .filter(_agree(F.col("sig"), F.col("so")) >= AGREEMENT)
                .select("doc_id")
                .distinct()
            )
            survivors = survivors.join(hist_drop, "doc_id", "left_anti")
        sv_ids = survivors.select("doc_id").persist()
        # epoch-keyed overwrites: an at-least-once replay of this batch
        # rewrites the same dirs with the same content (idempotent).
        # The sig table doubles as the admitted-docs record, so two
        # writes per epoch suffice.
        bands.join(sv_ids, "doc_id").write.mode("overwrite").parquet(
            f"{state_bands}/epoch={e}"
        )
        sig.join(sv_ids, "doc_id").write.mode("overwrite").parquet(
            f"{state_sigs}/epoch={e}"
        )
        for c in (sv_ids, sig, bands):
            c.unpersist(blocking=False)

    schema = spark.read.parquet(landing).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_sigs).select(
        "doc_id", F.col("epoch").cast("long").alias("epoch")
    )


@register(
    "st13_incremental_near_dup",
    None,  # LSH keep-lists are not SQL-expressible; rows-only + planted pytest
    category="streaming",
    doc=(
        "incremental near-duplicate dedup (dedup-against-history): the "
        "documents table arrives as two micro-batches — the corpus, then "
        "a perturbed replay (ids shifted, two tokens appended) — through "
        "a foreachBatch pipeline keeping a minhash-signature state "
        "table. Epoch 0 admits the within-batch keep-list; epoch 1 must "
        "drop every replayed doc whose signature agreement with history "
        "clears the threshold. State stores 64 longs per admitted doc "
        "(never text), band-join candidates + signature-agreement "
        "verification, epoch-keyed idempotent writes."
    ),
)
def st13_incremental_near_dup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    replay = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" replay marker")).alias("text"),
    )
    admitted = run_incremental_near_dup(spark, [d, replay])
    return (
        admitted.groupBy("epoch")
        .agg(
            F.count("*").cast("long").alias("n_admitted"),
            F.min("doc_id").cast("long").alias("first_admitted"),
            F.max("doc_id").cast("long").alias("last_admitted"),
        )
        .orderBy("epoch")
    )
