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
   batch). Bucket pair expansion is capped at ``bucket_cap`` ids; docs
   BEYOND the cap are not silently admitted — each one is verified
   against the bucket's minimum id (the representative of the
   mass-near-duplicate cluster that overflowed the bucket), and the
   over-cap doc count is recorded in the per-epoch stats row (no
   silent coverage caps).
3. History dedup: band-hash equi-join against the state table gives
   candidates. The BATCH side is broadcast in every history join, so
   the accumulated state is probed MAP-SIDE — no shuffle of history,
   ever; per-batch cost is one pruned state scan bounded by the batch
   size, not the corpus. Verification — within batch and against
   history — is MINHASH-SIGNATURE AGREEMENT (fraction of equal
   components estimates Jaccard): the state stores 64 longs per
   admitted doc, never text, so no check ever re-shuffles document
   bodies and ONE minhash pass per batch serves pairing, verification,
   and the state append.
4. Survivors append their bands+signatures to state; survivor ids land
   in a generation-keyed state dir. All writes are ``gen=N``
   overwrites, so foreachBatch's at-least-once replay is idempotent
   (same recipe as ``streaming/rollup.py``).

100 TB posture: the state table is the only growing structure. It is
kept compact and probe-friendly by (a) broadcasting the bounded batch
side so history never shuffles, (b) folding generations every
``compact_every`` epochs into ONE range-partitioned generation sorted
by (band_idx, band_hash) — file counts stay O(1) in ingest history and
the sorted layout gives tight parquet min/max stats on the join keys —
and (c) column pruning: the probe reads only (doc_id, band_idx,
band_hash). Nothing here collects to the driver; generation
transitions are directory renames.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..scratch import scratch_dir
from ..registry import register
from ..sources.readers import load_table
from ..functions.dedup import bands_from_signatures, minhash_signatures

K = 64
BANDS = 16
#: minimum fraction of equal minhash components (estimates Jaccard) for
#: a history candidate to count as a duplicate
AGREEMENT = 0.5
#: per-bucket pair-expansion cap (see ``within_batch_drops``): bounds the
#: O(cap²) bucket expansion; docs beyond it fall back to
#: representative-only verification rather than silent admission
BUCKET_CAP = 200


class EpochStore:
    """Generation-keyed parquet state store with idempotent epoch writes
    and crash-safe compaction.

    Layout: ``{path}/gen=e<N>`` holds epoch N's appended rows (the
    ``epoch`` value is ALSO a data column in the files, so folding
    preserves per-row provenance); ``{path}/gen=c<X>`` is a compacted
    generation covering every epoch ≤ X (the ``e``/``c`` prefixes keep
    the partition values string-typed so the keep-list ``isin`` filter
    never fights partition-type inference). Readers keep only the
    highest compacted generation plus the epoch generations above its cover —
    a crash between the compaction rename and the old-dir deletes (or a
    checkpoint-lost replay rewriting an already-folded epoch) leaves
    redundant dirs on disk that are simply excluded from every read, so
    state is never double-counted. The keep-list is applied as an
    ``isin`` filter on the ``gen`` partition column → Spark prunes the
    excluded DIRECTORIES at planning time.
    """

    def __init__(
        self,
        path: str,
        sort_cols: list[str],
        buckets: int = 4,
        partition_by: list[str] | None = None,
    ):
        self.path = path
        self.sort_cols = sort_cols
        self.buckets = buckets
        #: optional hive-style sub-partitioning INSIDE each generation
        #: (e.g. the vector index's cell id) — preserved by compaction,
        #: so directory pruning on these columns survives every fold
        self.partition_by = list(partition_by or [])

    # -- layout helpers ----------------------------------------------------
    def _gens(self) -> tuple[int, list[int]]:
        """(covered, live epoch gens above cover)."""
        if not os.path.isdir(self.path):
            return -1, []
        vals = [
            d[len("gen="):]
            for d in os.listdir(self.path)
            if d.startswith("gen=") and os.path.isdir(os.path.join(self.path, d))
        ]
        covered = max(
            (int(v[1:]) for v in vals if v.startswith("c") and v[1:].isdigit()),
            default=-1,
        )
        live = sorted(
            int(v[1:])
            for v in vals
            if v.startswith("e") and v[1:].isdigit() and int(v[1:]) > covered
        )
        return covered, live

    def exists(self) -> bool:
        covered, live = self._gens()
        return covered >= 0 or bool(live)

    # -- writes ------------------------------------------------------------
    def write_epoch(self, df: DataFrame, epoch: int) -> None:
        """Idempotent epoch append: a replayed batch overwrites its own
        generation dir with identical content."""
        out = (
            df.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .sortWithinPartitions(*(self.partition_by + self.sort_cols))
            .write.mode("overwrite")
        )
        if self.partition_by:
            out = out.partitionBy(*self.partition_by)
        out.parquet(os.path.join(self.path, f"gen=e{int(epoch)}"))

    def compact(self, spark: SparkSession, before_epoch: int) -> None:
        """Fold every generation strictly below ``before_epoch`` into one
        range-partitioned generation sorted on the join keys. The current
        epoch's dir is never folded, so a checkpoint-lost replay of the
        in-flight batch stays a pure overwrite. Crash-safe: the folded
        generation is written to a sibling tmp dir and renamed into
        place BEFORE the source dirs are deleted; readers ignore
        anything the new generation covers."""
        covered, live = self._gens()
        fold = [g for g in live if g < before_epoch]
        if not fold:
            return
        top = max(fold)
        vals = [f"e{g}" for g in fold]
        if covered >= 0:
            vals.append(f"c{covered}")
        cols = self.partition_by + self.sort_cols
        folded = (
            spark.read.parquet(self.path)
            .filter(F.col("gen").isin(vals))
            .drop("gen")
            .repartitionByRange(self.buckets, *cols)
            .sortWithinPartitions(*cols)
        )
        tmp = f"{self.path}.tmp-compact"
        shutil.rmtree(tmp, ignore_errors=True)
        writer = folded.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)
        dst = os.path.join(self.path, f"gen=c{top}")
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(tmp, dst)
        for v in vals:
            shutil.rmtree(os.path.join(self.path, f"gen={v}"), ignore_errors=True)
        # sweep compacted generations a previous crash left superseded
        # (readers already ignore everything below the highest cover)
        for d in os.listdir(self.path):
            v = d[len("gen="):] if d.startswith("gen=") else ""
            if v.startswith("c") and v[1:].isdigit() and int(v[1:]) < top:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # -- reads -------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        covered, live = self._gens()
        if covered < 0 and not live:
            return None
        vals = [f"e{g}" for g in live]
        if covered >= 0:
            vals.append(f"c{covered}")
        return (
            spark.read.parquet(self.path)
            .filter(F.col("gen").isin(vals))
            .drop("gen")
        )


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


def _agree(a, b):
    # fraction of equal minhash components ≈ Jaccard
    return F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(K))


def within_batch_drops(
    bands: DataFrame, sig: DataFrame, bucket_cap: int = BUCKET_CAP
) -> tuple[DataFrame, DataFrame]:
    """(near_drop, overcap_stats): bucket-local near-pair expansion with a
    deterministic cap and a REPRESENTATIVE FALLBACK for over-cap buckets.

    The first ``bucket_cap`` (sorted) ids of a bucket pair all-vs-all;
    every id beyond the cap pairs with the bucket's MIN id only — a hot
    bucket overflows precisely when it holds a mass-near-duplicate
    cluster, whose representative the minimum id is, so over-cap docs
    still get signature-verified instead of being silently admitted.
    ``overcap_stats`` is a one-row frame (n_overcap_docs) counting docs
    that took the representative path — surfaced per epoch in the stats
    table (no silent coverage caps)."""
    buckets = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("all_ids"))
        .filter(F.size("all_ids") > 1)
    )
    head = buckets.select(F.slice("all_ids", 1, bucket_cap).alias("ids"))
    head_pairs = (
        head.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    overflow = buckets.filter(F.size("all_ids") > bucket_cap)
    tail_pairs = overflow.select(
        F.element_at("all_ids", 1).alias("id_a"),
        F.explode(
            F.slice(
                "all_ids",
                bucket_cap + 1,
                F.size("all_ids") - F.lit(bucket_cap),
            )
        ).alias("id_b"),
    )
    overcap_stats = overflow.select(
        F.explode(F.slice("all_ids", bucket_cap + 1, F.size("all_ids"))).alias("i")
    ).agg(F.count_distinct("i").cast("long").alias("n_overcap_docs"))
    near_drop = (
        head_pairs.unionByName(tail_pairs)
        .distinct()
        .join(sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .filter(_agree(F.col("sa"), F.col("sb")) >= AGREEMENT)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return near_drop, overcap_stats


def history_drops(
    bands: DataFrame, sig: DataFrame, hist_bands: DataFrame, hist_sigs: DataFrame
) -> DataFrame:
    """Doc ids of the batch that near-duplicate an admitted historical
    doc. The batch side (bands, then candidates-with-signatures) is
    BROADCAST into both joins, so the accumulated history is probed
    map-side — zero Exchange on the state scans regardless of corpus
    size (plan-gated in tests/test_plans.py). The scans read only
    (doc_id, band_idx, band_hash) / (doc_id, sig)."""
    cand = (
        hist_bands.select(
            F.col("doc_id").alias("old_id"), "band_idx", "band_hash"
        )
        .join(
            F.broadcast(bands.select("doc_id", "band_idx", "band_hash")),
            ["band_idx", "band_hash"],
        )
        .select("doc_id", "old_id")
        .distinct()
    )
    cand_sig = cand.join(F.broadcast(sig), "doc_id")
    return (
        hist_sigs.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("so"))
        .join(F.broadcast(cand_sig), "old_id")
        .filter(_agree(F.col("sig"), F.col("so")) >= AGREEMENT)
        .select("doc_id")
        .distinct()
    )


def read_stats(spark: SparkSession, root: str) -> DataFrame:
    """Per-epoch admission stats: (epoch, n_admitted, n_overcap_docs).

    Stats are driver-known scalars, so they live as one JSON sidecar per
    epoch (atomic replace — replay-idempotent) instead of a per-epoch
    Spark write: surfacing the no-silent-caps counters costs zero extra
    Spark jobs beyond the two tiny counting actions."""
    import json

    stats_dir = os.path.join(root, "stats")
    rows = []
    if os.path.isdir(stats_dir):
        for f in sorted(os.listdir(stats_dir)):
            if f.startswith("epoch_") and f.endswith(".json"):
                with open(os.path.join(stats_dir, f)) as fh:
                    r = json.load(fh)
                rows.append(
                    (int(r["epoch"]), int(r["n_admitted"]), int(r["n_overcap_docs"]))
                )
    return spark.createDataFrame(
        rows, "epoch long, n_admitted long, n_overcap_docs long"
    )


def run_incremental_near_dup(
    spark: SparkSession,
    batches: list[DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    root: str | None = None,
    bucket_cap: int = BUCKET_CAP,
    compact_every: int = 8,
    state_buckets: int = 4,
) -> DataFrame:
    """Stage ``batches`` as one landing file each, stream them through
    the incremental dedup (one micro-batch per file, in list order), and
    return the admitted docs as (doc_id, epoch). Every ``compact_every``
    epochs the band/signature/stats state folds into one sorted,
    range-partitioned generation (``EpochStore.compact``), so state file
    counts are O(1) in ingest history. ``read_stats(spark, root)``
    surfaces per-epoch admission counts and the over-cap fallback
    counter."""
    root = root or scratch_dir(prefix="dlw_incdup_")
    landing = stage_batches(
        root,
        batches,
        [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")],
    )
    bands_store = EpochStore(
        os.path.join(root, "state_bands"),
        ["band_idx", "band_hash"],
        buckets=state_buckets,
    )
    sigs_store = EpochStore(
        os.path.join(root, "state_sigs"), ["doc_id"], buckets=state_buckets
    )
    stats_dir = os.path.join(root, "stats")
    os.makedirs(stats_dir, exist_ok=True)

    def dedup_batch(df: DataFrame, epoch_id: int) -> None:
        import json
        import time as _time

        t0 = _time.perf_counter()
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
        # stage attribution (VERDICT r6 item 4): DLW_ST13_PROFILE=1 forces
        # each lazy stage with a count and logs per-stage seconds into the
        # batch trace. Off by default — forcing breaks the single-job
        # fusion the production path relies on, so profiling is a mode,
        # not a side effect.
        profile = os.environ.get("DLW_ST13_PROFILE") == "1"
        stages: dict[str, float] = {}

        def _mark(name: str, start: float) -> float:
            now = _time.perf_counter()
            if profile:
                stages[name] = round(now - start, 3)
            return now

        wide = minhash_signatures(live, "doc_id", "text", k=K)
        sig = wide.select(
            "doc_id", F.array(*[F.col(f"h{i}") for i in range(K)]).alias("sig")
        ).persist()
        bands = bands_from_signatures(wide, "doc_id", K, BANDS).persist()
        t = t0
        if profile:
            sig.count(), bands.count()
            t = _mark("signatures", t)
        near_drop, overcap = within_batch_drops(bands, sig, bucket_cap)
        if profile:
            near_drop.count()
            t = _mark("within_batch", t)
        survivors = live.join(near_drop, "doc_id", "left_anti")
        hist_b = bands_store.read(s)
        if hist_b is not None:
            # STRICTLY EARLIER epochs only: an at-least-once replay of this
            # epoch would otherwise read its own first attempt's state,
            # self-match every admitted doc at agreement 1.0, and
            # overwrite the epoch's state with an empty set
            hist_drop = history_drops(
                bands,
                sig,
                hist_b.filter(F.col("epoch") < e),
                sigs_store.read(s).filter(F.col("epoch") < e),
            )
            if profile:
                hist_drop.count()
                t = _mark("history_probe", t)
            survivors = survivors.join(hist_drop, "doc_id", "left_anti")
        sv_ids = survivors.select("doc_id").persist()
        # generation-keyed overwrites: an at-least-once replay of this
        # batch rewrites the same dirs with the same content (idempotent).
        # The sig table doubles as the admitted-docs record.
        bands_store.write_epoch(bands.join(sv_ids, "doc_id"), e)
        sigs_store.write_epoch(sig.join(sv_ids, "doc_id"), e)
        n_admitted = sv_ids.count()
        n_overcap = (overcap.collect() or [None])[0]
        # driver-side JSON sidecar (atomic replace => replay-idempotent):
        # no Spark job for the one-row stats record
        tmp = os.path.join(stats_dir, f".tmp_epoch_{e}.json")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "epoch": e,
                    "n_admitted": int(n_admitted),
                    "n_overcap_docs": int(n_overcap[0]) if n_overcap else 0,
                },
                fh,
            )
        os.replace(tmp, os.path.join(stats_dir, f"epoch_{e}.json"))
        if compact_every and e > 0 and e % compact_every == 0:
            for store in (bands_store, sigs_store):
                store.compact(s, e)
        for c in (sv_ids, sig, bands):
            c.unpersist(blocking=False)
        # driver-side per-batch latency trace (diagnostic, append-only;
        # the scale probe reads it to assert per-batch cost stays flat
        # as history grows — the last-per-epoch line wins on replay)
        with open(os.path.join(root, "_batch_seconds.jsonl"), "a") as fh:
            rec = {"epoch": e, "seconds": round(_time.perf_counter() - t0, 3)}
            if profile:
                stages["writes_and_admin"] = round(_time.perf_counter() - t, 3)
                rec["stages"] = stages
            fh.write(json.dumps(rec) + "\n")

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
    return sigs_store.read(spark).select(
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
        "(never text); history is probed by BROADCASTING the batch side "
        "(no state shuffle) and folds into one sorted generation every "
        "compact_every epochs; over-cap buckets fall back to "
        "representative verification with a surfaced drop count."
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
