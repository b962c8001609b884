"""Chunk metadata catalog — the Spark-native re-expression of the
reference's DataManager + StorageEngine (SURVEY.md §1.3, §2.1 R1-R14).

Reference semantics reproduced here (with citations into /root/reference):

- ``DataChunk {id, dataset_id, block_range, files}``  (src/lib.rs:17-28)
    → a ``ChunkMeta`` row in an append-only Parquet metadata log plus a
      directory (or external references) of Parquet data files.
- RocksDB big-endian composite range index  (src/rocksdb_storage_engine.rs:181-192)
    → containment predicate on the metadata table; Parquet min/max pruning
      plays the role of key ordering. NOTE divergence D1: the reference's
      ``find_chunk_id`` does an exact get on ``[n, n+1)`` and so never finds
      a containing chunk (src/rocksdb_storage_engine.rs:39-49); we implement
      the documented intent: ``block_start <= n < block_end``.
- dedupe-by-id admission (``Entry::Vacant``, src/data_manager.rs:226-228)
    → idempotent ``register_chunk``.
- 1 TB cap check (src/data_manager.rs:19, :229-239)
    → ``SUM(size_bytes)`` guard raising ``MaxSizeAllocated`` (real, unlike
      the reference's stubbed size accounting — divergence D2).
- per-chunk reader semaphore / ``DataChunkRef`` RAII pin
  (src/data_manager.rs:16-55) → lease records + ``pin()`` context manager.
- deferred delete draining all permits (src/data_manager.rs:124-162)
    → ``schedule_delete`` flips state to PENDING_DELETE (immediately
      invisible to ``find_chunk`` — divergence D4 semantics) and ``vacuum``
      physically removes chunks whose lease count is zero (the
      ``acquire_many`` barrier, src/data_manager.rs:141-144).

Design for scale: the metadata log is O(#chunks), not O(data); every data
operation is a Spark DataFrame over the chunk files; driver-side work is
metadata-only. The log is append-only one-Parquet-file-per-commit with
atomic exclusive creation of the seq-named commit file — multi-writer
CAS (the reference only COMMENTS that conflicts "are not expected",
src/data_manager.rs:259-262; here they are detected and retried);
``compact()`` folds the log. On a cluster the same layout works on any
rename-atomic store; for S3-class stores swap the backend (CatalogBackend
is the ``StorageEngine`` trait analog, src/lib.rs:75-103).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from abc import ABC, abstractmethod
from contextlib import contextmanager
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import ChunkConflict, MaxSizeAllocated

# Reference: MAX_SIZE_ON_DISK = 1 TB (src/data_manager.rs:19)
MAX_SIZE_ON_DISK = 1_000_000_000_000

ACTIVE = "ACTIVE"
PENDING_DELETE = "PENDING_DELETE"
DELETED = "DELETED"

_META_SCHEMA = pa.schema(
    [
        ("dataset_id", pa.string()),
        ("chunk_id", pa.string()),
        ("block_start", pa.int64()),
        ("block_end", pa.int64()),
        ("files", pa.string()),  # JSON map name -> url/path
        ("size_bytes", pa.int64()),
        ("state", pa.string()),
        ("seq", pa.int64()),
        ("created_at", pa.timestamp("us")),
    ]
)


@dataclass(frozen=True)
class ChunkMeta:
    """A chunk descriptor (analog of DataChunk, src/lib.rs:17-28)."""

    dataset_id: str
    chunk_id: str
    block_start: int
    block_end: int
    files: dict = field(default_factory=dict)
    size_bytes: int = 0

    def __post_init__(self):
        if not (0 <= self.block_start < self.block_end):
            raise ValueError("block range must be non-empty half-open [start, end)")


class CatalogBackend(ABC):
    """Backend-agnostic storage contract (StorageEngine trait analog,
    src/lib.rs:75-103)."""

    @abstractmethod
    def append_record(self, record: dict) -> None: ...

    def append_records(self, records: list[dict]) -> None:
        """Bulk commit (one version, many records). Backends without a
        native bulk path only support single-record commits."""
        if len(records) == 1:
            self.append_record(records[0])
            return
        raise NotImplementedError("this backend has no bulk commit")

    @abstractmethod
    def read_records(self) -> list[dict]: ...

    def frontier_seq(self) -> int:
        """Highest committed seq. Writers MUST pick seqs above this before
        every commit: the CAS exclusive-create only detects a version
        collision while the version's file still exists, and compaction
        folds old files away — a writer whose local clock trails the
        frontier would otherwise silently reuse a folded seq and fork
        history (two records, one version; the fold then drops one)."""
        records = self.read_records()
        return records[-1]["seq"] if records else 0

    def create_tag(self, name: str, seq: int) -> None:
        """Immutable named version ref (optional backend capability)."""
        raise NotImplementedError("this backend has no tags")

    def list_tags(self) -> dict[str, int]:
        return {}

    def delete_tag(self, name: str) -> bool:
        return False

    @abstractmethod
    def add_lease(self, lease_id: str, chunk_id: str) -> None: ...

    @abstractmethod
    def remove_lease(self, lease_id: str) -> None: ...

    @abstractmethod
    def live_leases(self, ttl_seconds: float | None = None) -> dict[str, str]: ...

    @abstractmethod
    def delete_chunk_files(self, path: str) -> None: ...


class ParquetCatalogBackend(CatalogBackend):
    """Default backend: Parquet metadata log + lease marker files on a
    rename-atomic filesystem (the RocksDB analog,
    src/rocksdb_storage_engine.rs:16-19)."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "_meta")
        self.lease_dir = os.path.join(root, "_leases")
        self.tag_dir = os.path.join(root, "_tags")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.lease_dir, exist_ok=True)
        os.makedirs(self.tag_dir, exist_ok=True)

    # fold the log into one file once it exceeds this many commits (the
    # LSM-compaction analog of the reference's RocksDB backend)
    AUTO_COMPACT_AT = 64

    #: Newest seq auto-compaction may fold (None = no retention promise:
    #: fold everything to latest-per-chunk, the bounded default).
    #: ``compact(retain_last=K>0)`` (the ``checkpoint`` path) sets this
    #: floor to its cutoff, so the retained-tail window a checkpoint
    #: promises survives subsequent auto-compactions instead of being
    #: folded by the 65th commit; a plain ``compact()`` clears it (a full
    #: fold is an explicit choice to drop history, not a promise).
    #: In-memory only: retention is a per-process dial — a writer in
    #: another process that never checkpointed compacts with its own
    #: (default fold-all) floor.
    retain_floor_seq: int | None = None

    def append_record(self, record: dict) -> None:
        """Commit one record at exactly ``seq`` — compare-and-swap via the
        one primitive every POSIX/object store with if-none-match offers:
        exclusive creation. The file name IS the seq, so two writers
        racing the same version cannot both win: ``os.link`` fails for
        the loser (``ChunkConflict``), who must re-read the log, pick a
        later seq, and re-validate. This is the Delta/Iceberg commit
        protocol in miniature; the former uuid-suffixed naming let both
        racers "succeed" and silently forked history.

        Filesystems that forbid hard links (some FUSE/network mounts:
        EPERM/EXDEV) fall back to ``O_CREAT|O_EXCL`` on the final name —
        the same exclusive-create guarantee, just copying bytes instead
        of linking the already-written temp file."""
        self.append_records([record])

    def append_records(self, records: list[dict]) -> None:
        """Bulk form of the CAS commit: every record shares ONE version
        (identical ``seq``) and lands in one exclusively-created file —
        a backfill of 10⁶ chunks is batches of single commits, not 10⁶
        log files. The fold dedupes on (seq, chunk_id), so a bulk commit
        must not repeat a chunk_id (validated by the catalog layer)."""
        record = records[0]
        table = pa.Table.from_pylist(records, schema=_META_SCHEMA)
        name = f"{record['seq']:020d}.parquet"
        dst = os.path.join(self.meta_dir, name)
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}-{name}")
        pq.write_table(table, tmp)
        try:
            os.link(tmp, dst)
        except FileExistsError:
            raise ChunkConflict(
                f"seq {record['seq']} already committed by another writer"
            ) from None
        except OSError:  # link unsupported here -> O_EXCL fallback
            with open(tmp, "rb") as src:
                payload = src.read()
            try:
                fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ChunkConflict(
                    f"seq {record['seq']} already committed by another writer"
                ) from None
            # the bytes were read BEFORE the exclusive create (above), so
            # the claimed file's size-0 window is one syscall wide — and
            # the copy flushes in chunks so a slow large copy keeps its
            # size/mtime moving, never sitting "stable" long enough for
            # _probe_commit's grace heuristic to misread a LIVE writer
            # as crashed (ADVICE r6)
            with os.fdopen(fd, "wb") as out:
                for i in range(0, len(payload), 1 << 16):
                    out.write(payload[i : i + (1 << 16)])
                    out.flush()
            # the O_EXCL path makes the commit file visible BEFORE its
            # bytes finish copying; this sidecar marker is the "copy
            # complete" signal that lets readers distinguish an in-flight
            # slow writer from a crashed one WITHOUT a timing heuristic
            # (aborted_top consults it). The hard-link path needs no
            # marker: a linked file is complete the instant it appears.
            with open(dst[: -len(".parquet")] + ".done", "w"):
                pass
        finally:
            os.remove(tmp)
        n_files = sum(
            1
            for f in os.listdir(self.meta_dir)
            if f.endswith(".parquet") and not f.startswith(".tmp-")
        )
        if n_files > self.AUTO_COMPACT_AT:
            # honor the checkpoint retention floor when one was promised:
            # fold only history at or below it (retain_last is a seq-delta
            # from the current max). With no promise, fold everything to
            # latest-per-chunk — the bounded default.
            if self.retain_floor_seq is None:
                self.compact()
            else:
                self.compact(
                    retain_last=max(
                        0, self.frontier_seq() - self.retain_floor_seq
                    )
                )

    def frontier_seq(self) -> int:
        """Cheap frontier: the max canonical (seq-named) file. compact()
        always RETAINS the highest canonical file it folds, so this
        listing can never go backwards through a compaction."""
        best = 0
        for f in os.listdir(self.meta_dir):
            stem = f.split(".")[0]
            if f.endswith(".parquet") and stem.isdigit():
                best = max(best, int(stem))
        return best

    #: A claimed-but-unreadable commit with NO completion marker is only
    #: classified ABORTED once its bytes have been stable this long — a
    #: slow in-flight linkless-fallback copy keeps mutating size/mtime, a
    #: crashed one froze. Misclassifying in-flight as aborted would let
    #: the adopter commit at seq+1 with preconditions validated against a
    #: state excluding the slow writer's records (serializability break);
    #: the cost of waiting is only paid on the rare wedged path.
    ABORTED_GRACE_SECONDS = 2.0

    def _probe_commit(self, path: str) -> str:
        """Classify a claimed commit file: 'readable', 'complete'
        (unreadable but its copy-complete marker exists — transient),
        'aborted' (no marker, bytes stable past the grace window),
        'inflight' (no marker, bytes still changing / too young), or
        'vanished' (compacted away)."""
        import pyarrow.parquet as _pq

        marker = path[: -len(".parquet")] + ".done"
        last_sig = None
        start = time.monotonic()
        stable_since = start
        while True:
            try:
                _pq.read_table(path, schema=_META_SCHEMA)
                return "readable"
            except FileNotFoundError:
                return "vanished"
            except Exception:  # noqa: BLE001 — truncated
                pass
            if os.path.exists(marker):
                return "complete"
            try:
                st = os.stat(path)
                sig = (st.st_size, st.st_mtime_ns)
            except FileNotFoundError:
                return "vanished"
            now = time.monotonic()
            if sig != last_sig:
                last_sig = sig
                stable_since = now
            # a size-0 claimed file is the narrowest live-writer state
            # (fd created, first chunk not yet written — one syscall
            # wide since the payload is pre-read); it gets a 5x longer
            # grace before being declared crashed, because unlike a
            # partial copy there are no moving bytes to prove liveness
            grace = self.ABORTED_GRACE_SECONDS * (5.0 if sig[0] == 0 else 1.0)
            if now - stable_since >= grace:
                return "aborted"
            if now - start >= 10 * self.ABORTED_GRACE_SECONDS:
                return "inflight"  # pathological flapping: don't adopt
            time.sleep(0.05)

    def aborted_top(self, above: int) -> int:
        """Highest version reachable from ``above`` through contiguous
        ABORTED commits — claimed (seq-named file exists) but unreadable
        (a linkless-fallback writer crashed mid-copy). Stops at the
        first READABLE unfolded commit, which the caller must fold
        before committing. A commit is classified aborted only via
        ``_probe_commit``: its copy-complete sidecar marker is absent
        AND its bytes have been stable past ``ABORTED_GRACE_SECONDS`` —
        a slow in-flight writer (marker not yet written, bytes still
        arriving) is waited out, never adopted past."""
        seqs = sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.endswith(".parquet")
            and f.split(".")[0].isdigit()
            and int(f.split(".")[0]) > above
        )
        top = above
        for s in seqs:
            status = self._probe_commit(
                os.path.join(self.meta_dir, f"{s:020d}.parquet")
            )
            if status != "aborted":
                # readable/complete: the caller must fold it; vanished:
                # re-fold a fresh listing; inflight: wait, don't adopt
                break
            top = s
        return top

    def read_records(self) -> list[dict]:
        import pyarrow.dataset as ds

        # a concurrent compaction (single writer, many readers) can delete
        # log files between our listing and the read — the fold is
        # equivalent before and after compaction, so just re-list and
        # retry on vanished files. The O_EXCL linkless fallback also makes
        # a commit file visible BEFORE its bytes finish copying: a
        # truncated parquet read is transient (retry), but a writer that
        # crashed mid-copy leaves it truncated forever — an ABORTED
        # commit. Its seq stays claimed (the filename anchors
        # frontier_seq, so the version is never reused) and the final
        # attempt folds the log without it, exactly as if the dead writer
        # had never been acked.
        truncated_retries, relists = 0, 0
        while True:
            files = [
                os.path.join(self.meta_dir, f)
                for f in sorted(os.listdir(self.meta_dir))
                if f.endswith(".parquet") and not f.startswith(".tmp-")
            ]
            if not files:
                return []
            try:
                table = ds.dataset(
                    files, schema=_META_SCHEMA, format="parquet"
                ).to_table()
            except FileNotFoundError:
                # racing compaction deleted a listed file: its content
                # lives in the racer's compacted file — relist. Each
                # relist implies a compaction committed, so the cap is a
                # liveness backstop, not a correctness knob.
                relists += 1
                if relists > 16:
                    raise
                continue
            except Exception:  # truncated/in-flight file — retry, then skip
                truncated_retries += 1
                if truncated_retries < 5:
                    continue
                import pyarrow.parquet as _pq

                batches, vanished = [], False
                for f in files:
                    try:
                        batches.append(
                            _pq.read_table(f, schema=_META_SCHEMA)
                        )
                    except FileNotFoundError:
                        # NOT an aborted commit: a compactor racing
                        # between our listing and this read deleted the
                        # file, and its records exist only in a compacted
                        # file absent from the stale listing — skipping
                        # it would silently drop committed state. Relist.
                        vanished = True
                        break
                    except Exception:  # noqa: BLE001 — aborted commit
                        continue
                if vanished:
                    relists += 1
                    if relists > 16:
                        raise ChunkConflict(
                            "metadata listing kept vanishing under "
                            "racing compactions"
                        )
                    continue
                if not batches:
                    return []
                table = pa.concat_tables(batches)
            rows = sorted(
                table.to_pylist(), key=lambda r: (r["seq"], r["chunk_id"])
            )
            # racing compactors can each copy the same committed record
            # into their own compacted file — a (seq, chunk_id) pair is
            # committed exactly once (CAS; a bulk commit holds many
            # chunk_ids under ONE seq), so duplicate pairs are identical
            # rows; keep one
            out, last = [], None
            for r in rows:
                key = (r["seq"], r["chunk_id"])
                if key != last:
                    out.append(r)
                    last = key
            return out

    def compact(self, retain_last: int = 0) -> None:
        """Fold the log to the LATEST record per chunk_id (keeping DELETED
        tombstones as single rows). Without the fold, auto-compaction
        rewrites the full history every time — O(N²) cumulative I/O.

        With ``retain_last=K`` this is a Delta-style checkpoint instead:
        records in the last K commits are kept verbatim and only the
        older prefix folds, so ``state_as_of(seq)`` stays EXACT for any
        seq within the retained window (and for the cutoff itself, since
        folded records keep their original seq). Plain compaction
        (K=0) keeps only each chunk's latest record — history before the
        newest transitions degrades, which is why lk06 calls compaction
        a version-retention decision.

        Concurrency contract: the fold reads EXACTLY the file snapshot it
        later deletes. Listing the deletions separately (the earlier
        code) lost any commit that landed between the fold and the
        delete — the file was removed without its record being folded
        in. A commit after the snapshot is simply left in place; a
        racing compactor deleting our files mid-read triggers a relist
        of a fresh snapshot."""
        import pyarrow.dataset as ds

        truncated_retries, relists = 0, 0
        while True:
            files = sorted(
                f
                for f in os.listdir(self.meta_dir)
                if f.endswith(".parquet") and not f.startswith(".tmp-")
            )
            if not files:
                return
            try:
                table = ds.dataset(
                    [os.path.join(self.meta_dir, f) for f in files],
                    schema=_META_SCHEMA,
                    format="parquet",
                ).to_table()
            except FileNotFoundError:
                # racing compactor deleted a listed file — its content is
                # in the racer's compacted output only: relist, never fold
                # a snapshot missing committed records
                relists += 1
                if relists > 16:
                    return  # the racer is compacting; nothing left to do
                continue
            except Exception:  # in-flight truncated file
                truncated_retries += 1
                if truncated_retries < 5:
                    continue
                # final attempt: fold around ABORTED (permanently
                # unreadable) commit files instead of giving up —
                # otherwise one crashed linkless-fallback writer would
                # disable compaction forever and the log grows unbounded.
                # Only successfully-read files enter the fold AND the
                # deletion snapshot; aborted files are left untouched
                # (their filename keeps the claimed seq anchored). A
                # VANISHED file here is a racing compaction, not an
                # abort — relist (same reasoning as read_records).
                readable, parts, vanished = [], [], False
                for f in files:
                    try:
                        parts.append(
                            pq.read_table(
                                os.path.join(self.meta_dir, f),
                                schema=_META_SCHEMA,
                            )
                        )
                        readable.append(f)
                    except FileNotFoundError:
                        vanished = True
                        break
                    except Exception:  # noqa: BLE001 — aborted commit
                        continue
                if vanished:
                    relists += 1
                    if relists > 16:
                        return
                    continue
                if not parts:
                    return
                files = readable
                table = pa.concat_tables(parts)
            break
        rows = sorted(table.to_pylist(), key=lambda r: (r["seq"], r["chunk_id"]))
        records, last = [], None
        for r in rows:  # same-(seq,chunk) duplicates from racing compactors
            key = (r["seq"], r["chunk_id"])
            if key != last:
                records.append(r)
                last = key
        if not records:
            return
        cutoff = records[-1]["seq"] - retain_last
        # tags pin versions: every fold keeps history from the oldest
        # tagged version onward verbatim, so ``state_as_of`` stays exact
        # at (and after) each tag regardless of auto-compaction. Tags
        # created AFTER history already degraded cannot resurrect it —
        # exactness is guaranteed for folds that run after the tag.
        tags = self.list_tags()
        if tags:
            cutoff = min(cutoff, min(tags.values()))
        # the latest retention request wins: later auto-compactions fold
        # nothing newer than this cutoff. A full fold (retain_last=0)
        # clears the promise instead of freezing all future history
        # verbatim (see retain_floor_seq); durable tags re-clamp every
        # subsequent fold on their own.
        self.retain_floor_seq = cutoff if retain_last > 0 else None
        tail = [r for r in records if r["seq"] > cutoff]
        latest: dict[str, dict] = {}
        for rec in records:  # seq-sorted
            if rec["seq"] <= cutoff:
                latest[rec["chunk_id"]] = rec
        records = sorted(latest.values(), key=lambda r: r["seq"]) + tail
        table = pa.Table.from_pylist(records, schema=_META_SCHEMA)
        name = f"compacted-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.meta_dir, f".tmp-{name}")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.meta_dir, name))
        # retain the newest canonical files: the highest anchors
        # frontier_seq() (so no writer can reuse a folded version), and
        # keeping a small tail of them closes the narrow race where a
        # writer passes its frontier check, a racer commits twice, and a
        # compaction folds the in-between seq before the writer's
        # exclusive-create lands — with the tail retained, that create
        # still collides. Their duplicate content (also in the compacted
        # file) is collapsed by the same-seq dedupe on read.
        # -- tag/fold handshake (ADVICE r6, tightened r7) -----------------
        # A create_tag racing this fold could land between the tag
        # snapshot above and the deletes below, silently losing the
        # exact history its docs promise. Both sides order through
        # shared markers, two-phase on the fold side:
        #   fold:  create INTENT(cutoff)  ->  re-read tags
        #          -> conflict: remove intent, abort (nothing deleted)
        #          -> clean:    publish committed floor(cutoff) -> delete
        #                       (intent mtime refreshed during the loop,
        #                        removed when done)
        #   tag:   create tag file -> read max(committed, live intents)
        #          -> fail-and-delete if seq below it
        # Any tag the re-read misses was created after the intent, so
        # its own post-create check sees the intent (or the committed
        # floor) and fails; any tag the re-read sees aborts the deletes.
        # The ABORT path leaves no committed floor behind — a tag at a
        # below-cutoff seq whose history was never actually collapsed
        # succeeds on retry instead of being rejected forever (the r7
        # review finding on the one-phase design). A crashed fold's
        # stale intent (no mtime refresh past INTENT_STALE_SECONDS) is
        # ignored: deletes only ever start after the committed floor is
        # published, so a pre-floor crash destroyed nothing.
        intent = self._create_fold_intent(cutoff)
        try:
            late_tags = self.list_tags()
            if late_tags and min(late_tags.values()) < cutoff:
                # a tag landed under the fold: keep every source file
                # (the compacted file is a benign duplicate —
                # same-(seq,chunk) dedupe on read collapses it); the
                # next fold re-clamps to the new tag
                return
            # liveness proof before the destructive phase (review r7b):
            # if this fold stalled past INTENT_STALE_SECONDS, a racer may
            # have judged the intent crashed, pruned it, and let a
            # below-cutoff tag commit — refresh the claim and abort if it
            # is gone; a fresh mtime means no tagger can ignore it from
            # here to the floor publish
            try:
                os.utime(intent)
            except FileNotFoundError:
                return  # judged crashed while stalled: retry next round
            floor_path = self._publish_fold_floor(cutoff)
            # second tag re-read, post-floor: a tag whose floor check ran
            # in the stale-intent gap (before the refresh above) could
            # have committed — it is visible by now (its file landed
            # before its check, which ran before the floor publish), so
            # aborting the deletes here keeps it exact. Since no deletes
            # ran, the floor is RETRACTED (r8, ADVICE r7): floors are
            # per-fold files, so this removes only our own claim — a
            # concurrent fold mid-delete keeps its own floor, and lower
            # floors are only ever pruned by a fold whose own floor just
            # became permanent (post-delete), so coverage never vanishes.
            late_tags = self.list_tags()
            if late_tags and min(late_tags.values()) < cutoff:
                try:
                    os.remove(floor_path)
                except FileNotFoundError:
                    pass
                return
            canon = sorted(
                (f for f in files if f.split(".")[0].isdigit()),
                key=lambda f: int(f.split(".")[0]),
            )
            # half the log up to 8 files: enough that the race needs more
            # concurrent commits than ever plausible inside the window,
            # while small explicit compactions still shrink the file count
            keep = set(canon[-max(1, min(8, len(canon) // 2)):])
            for i, f in enumerate(files):  # exactly the snapshot folded
                if f in keep:
                    continue
                if i % 64 == 0:
                    # liveness: a slow delete loop keeps its intent fresh
                    # so create_tag never mistakes it for a crashed fold
                    try:
                        os.utime(intent)
                    except FileNotFoundError:
                        pass
                try:
                    os.remove(os.path.join(self.meta_dir, f))
                except FileNotFoundError:
                    pass  # a racing compactor already removed it
                # drop the folded commit's copy-complete marker too
                # (markers are only consulted while their commit file
                # exists)
                try:
                    os.remove(
                        os.path.join(
                            self.meta_dir, f[: -len(".parquet")] + ".done"
                        )
                    )
                except FileNotFoundError:
                    pass
            # deletes complete: our floor is permanent from here, so
            # lower floors are redundant for the max and safe to prune
            # (never at publish time — pruning there could strip a
            # mid-delete fold's coverage and then retract our own)
            self._prune_floors_below(cutoff)
        finally:
            try:
                os.remove(intent)
            except FileNotFoundError:
                pass

    # -- fold floor: the tag/fold handshake markers -------------------------
    #: A fold intent whose mtime is older than this is a crashed fold:
    #: live folds refresh the intent during the delete loop, and deletes
    #: only start AFTER the committed floor is published, so ignoring a
    #: stale intent can never hide a destructive fold.
    INTENT_STALE_SECONDS = 30.0

    #: Crashed intents are PRUNED only at 10x the staleness window.
    #: Readers already ignore merely-stale intents (mtime filter), so
    #: pruning is pure directory hygiene — and the stat-then-remove it
    #: uses is inherently racy against a live fold's utime refresh
    #: (ADVICE r7). Widening the prune threshold shrinks that spurious-
    #: abort window 10x: a fold stalled 30-300 s is ignored but NOT
    #: removed, and when it wakes its refresh revives it safely (the
    #: post-floor tag re-read covers anything a tagger did meanwhile).
    INTENT_PRUNE_SECONDS = 300.0

    def _create_fold_intent(self, cutoff: int) -> str:
        """Phase-1 marker: 'a fold with this cutoff is deciding whether
        to delete'. Per-fold unique file so an abort retracts ONLY its
        own claim; long-crashed folds' intents are pruned here."""
        for f in os.listdir(self.meta_dir):
            if f.startswith(".floor-intent-"):
                p = os.path.join(self.meta_dir, f)
                try:
                    if time.time() - os.stat(p).st_mtime > self.INTENT_PRUNE_SECONDS:
                        os.remove(p)
                except FileNotFoundError:
                    pass
        path = os.path.join(
            self.meta_dir, f".floor-intent-{cutoff:020d}-{uuid.uuid4().hex}"
        )
        os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return path

    def active_fold_intents(self) -> int:
        """Highest cutoff among LIVE fold intents (mtime within the
        staleness window); 0 if none."""
        best = 0
        now = time.time()
        for f in os.listdir(self.meta_dir):
            if not f.startswith(".floor-intent-"):
                continue
            try:
                st = os.stat(os.path.join(self.meta_dir, f))
            except FileNotFoundError:
                continue
            if now - st.st_mtime > self.INTENT_STALE_SECONDS:
                continue
            try:
                best = max(best, int(f[len(".floor-intent-"):].split("-")[0]))
            except ValueError:
                continue
        return best

    def _publish_fold_floor(self, cutoff: int) -> str:
        """Phase-2 marker: 'a fold collapsing history below ``cutoff``
        IS deleting / has deleted'. Per-fold unique ``.floor-<n>-<uuid>``
        file (r8), read as the max over the listing, so the post-floor
        abort path can retract exactly its own claim. Deliberately NO
        pruning here: removing another fold's lower floor at publish
        time and then retracting our own would strip a mid-delete
        fold's coverage — pruning happens only in
        ``_prune_floors_below`` after OUR deletes complete, when our
        floor is permanent and the max can never regress. Published
        only after the post-intent tag re-read comes back clean, so it
        never over-states an aborted fold."""
        path = os.path.join(
            self.meta_dir, f".floor-{cutoff:020d}-{uuid.uuid4().hex}"
        )
        os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return path

    def _prune_floors_below(self, cutoff: int) -> None:
        """Directory hygiene after a SUCCESSFUL fold: floors below
        ``cutoff`` are redundant (our permanent floor dominates the max)
        and safe to remove — a racing lower fold that loses its file
        while mid-delete stays covered by ours, and its own abort
        retraction tolerates the missing file."""
        for f in os.listdir(self.meta_dir):
            if (
                f.startswith(".floor-")
                and not f.startswith(".floor-intent-")
                and self._floor_cutoff(f) < cutoff
            ):
                try:
                    os.remove(os.path.join(self.meta_dir, f))
                except FileNotFoundError:
                    pass

    @staticmethod
    def _floor_cutoff(fname: str) -> int:
        """Cutoff encoded in a ``.floor-<n>[-<uuid>]`` file name (both
        the r8 per-fold format and the legacy single-file format); -1
        for unparseable names so they are never treated as a floor."""
        try:
            return int(fname[len(".floor-"):].split("-")[0])
        except ValueError:
            return -1

    def fold_floor(self) -> int:
        """Highest cutoff any committed/committing destructive fold has
        published; tags must point at-or-above it to be exact."""
        best = 0
        for f in os.listdir(self.meta_dir):
            if f.startswith(".floor-") and not f.startswith(".floor-intent-"):
                best = max(best, self._floor_cutoff(f))
        return best

    def _floor_and_intents(self) -> int:
        """max(committed floor, live intents) from ONE directory listing
        (create_tag's hot-path check)."""
        best = 0
        now = time.time()
        for f in os.listdir(self.meta_dir):
            if f.startswith(".floor-intent-"):
                p = os.path.join(self.meta_dir, f)
                try:
                    if now - os.stat(p).st_mtime > self.INTENT_STALE_SECONDS:
                        continue
                    best = max(best, int(f[len(".floor-intent-"):].split("-")[0]))
                except (FileNotFoundError, ValueError):
                    continue
            elif f.startswith(".floor-"):
                best = max(best, self._floor_cutoff(f))
        return best

    # -- tags: immutable named refs to committed versions ------------------
    #: A claimed tag file that is empty/unparseable (a crashed O_EXCL
    #: fallback writer) is reclaimable once this old — a LIVE fallback
    #: writer finishes its single small write in microseconds.
    TAG_RECLAIM_GRACE_SECONDS = 2.0

    def create_tag(self, name: str, seq: int) -> None:
        """Record an immutable named ref to version ``seq`` (the
        Iceberg-tag shape). Exclusive creation — re-tagging a name is a
        conflict, not an overwrite; a tag never moves.

        Two failure modes are handled beyond the happy path (ADVICE r6):
        a crashed fallback writer's empty/corrupt tag file is reclaimed
        after a grace window instead of poisoning the name forever, and
        a create racing a compaction fold re-checks the published fold
        floor AFTER the tag lands — if the fold already collapsed
        history below ``seq``, the tag is deleted and the create fails
        loudly rather than silently losing its exactness guarantee
        (see the handshake comment in ``compact``)."""
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid tag name {name!r}")
        dst = os.path.join(self.tag_dir, name)
        tmp = os.path.join(self.tag_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"name": name, "seq": int(seq), "created_at": time.time()}, fh)
        try:
            for attempt in (0, 1):
                try:
                    self._create_tag_file(tmp, dst)
                    break
                except ChunkConflict:
                    if attempt or not self._reclaim_dead_tag(dst):
                        raise
        finally:
            os.remove(tmp)
        # committed floors mean history below them IS collapsed; a live
        # intent means a fold is deciding RIGHT NOW (its tag re-read may
        # already have run) — both must fail the create. The intent case
        # is transient: an aborted fold removes its intent without ever
        # publishing a floor, so the caller's retry succeeds. One listdir
        # serves both marker families.
        floor = self._floor_and_intents()
        if int(seq) < floor:
            self.delete_tag(name)
            raise ChunkConflict(
                f"tag {name!r} at seq {seq} raced a compaction fold "
                f"(floor {floor}): history below the floor may be "
                "collapsed — re-read the frontier and retag"
            )

    def _create_tag_file(self, tmp: str, dst: str) -> None:
        try:
            os.link(tmp, dst)
        except FileExistsError:
            raise ChunkConflict(f"tag already exists: {dst}") from None
        except OSError:
            try:
                fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ChunkConflict(f"tag already exists: {dst}") from None
            # single small write on the O_EXCL-claimed fd; a crash
            # before it completes leaves the empty/partial file that
            # _reclaim_dead_tag garbage-collects after the grace window
            with open(tmp, "rb") as src, os.fdopen(fd, "wb") as out:
                payload = src.read()
                out.write(payload)
            # read-back verify (review r7): if this writer stalled past
            # the reclaim grace, a racing create_tag may have unlinked
            # the claimed inode and retaken the name — the write above
            # then landed in an orphaned inode and MUST NOT report
            # success (silent loss of an "immutable" tag binding). A
            # completed tag parses, so no reclaimer removes it after
            # this check passes; the residual window (removal between
            # our write and this read) converts to a loud conflict.
            try:
                with open(dst, "rb") as back:
                    if back.read() != payload:
                        raise ChunkConflict(
                            f"tag write raced a reclaim and lost: {dst}"
                        )
            except FileNotFoundError:
                raise ChunkConflict(
                    f"tag write raced a reclaim and lost: {dst}"
                ) from None

    def _reclaim_dead_tag(self, dst: str) -> bool:
        """True if ``dst`` was a crashed writer's unreadable tag file and
        was removed (caller may retry its exclusive create once). A
        healthy tag file never matches: it parses. A LIVE in-flight
        fallback writer is protected by the grace window on mtime."""
        try:
            st = os.stat(dst)
        except FileNotFoundError:
            return True  # racing reclaimer already removed it
        try:
            with open(dst) as fh:
                json.load(fh)
            return False  # parseable: a real committed tag
        except (OSError, ValueError):
            pass
        if time.time() - st.st_mtime < self.TAG_RECLAIM_GRACE_SECONDS:
            return False  # possibly a live writer mid-copy: wait it out
        try:
            os.remove(dst)
        except FileNotFoundError:
            pass
        return True

    def list_tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for f in os.listdir(self.tag_dir):
            if f.startswith("."):
                continue
            try:
                with open(os.path.join(self.tag_dir, f)) as fh:
                    rec = json.load(fh)
                out[rec["name"]] = int(rec["seq"])
            except (OSError, ValueError, KeyError):
                continue  # half-written racer; its create will finish or fail
        return out

    def delete_tag(self, name: str) -> bool:
        try:
            os.remove(os.path.join(self.tag_dir, name))
            return True
        except FileNotFoundError:
            return False

    def add_lease(self, lease_id: str, chunk_id: str) -> None:
        tmp = os.path.join(self.lease_dir, f".tmp-{lease_id}")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "lease_id": lease_id,
                    "chunk_id": chunk_id,
                    "acquired_at": time.time(),
                },
                fh,
            )
        os.rename(tmp, os.path.join(self.lease_dir, lease_id))

    def remove_lease(self, lease_id: str) -> None:
        try:
            os.remove(os.path.join(self.lease_dir, lease_id))
        except FileNotFoundError:
            pass

    def live_leases(self, ttl_seconds: float | None = None) -> dict[str, str]:
        """Live leases; with a TTL, leases older than it are EXPIRED —
        reaped from disk and excluded. (The reference's semaphore permits
        die with the process; durable lease files need an expiry so a
        crashed reader cannot block vacuum forever.)"""
        out = {}
        now = time.time()
        for f in os.listdir(self.lease_dir):
            if f.startswith(".tmp-"):
                continue
            p = os.path.join(self.lease_dir, f)
            try:
                with open(p) as fh:
                    rec = json.load(fh)
                if (
                    ttl_seconds is not None
                    and now - rec.get("acquired_at", 0) > ttl_seconds
                ):
                    os.remove(p)
                    continue
                out[rec["lease_id"]] = rec["chunk_id"]
            except (OSError, json.JSONDecodeError):
                continue
        return out

    def delete_chunk_files(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)


class ChunkRef:
    """RAII read pin (DataChunkRef analog, src/lib.rs:40-45,
    src/data_manager.rs:24-55): while held, vacuum will not remove the
    chunk; ``path()`` resolves the data location (implements the
    reference's stubbed ``chunk_path``, src/rocksdb_storage_engine.rs:138-141)."""

    def __init__(self, catalog: ChunkCatalog, meta: ChunkMeta, lease_id: str):
        self._catalog = catalog
        self.meta = meta
        self.lease_id = lease_id
        self._released = False

    def path(self) -> str:
        return self._catalog.chunk_path(self.meta)

    def release(self) -> None:
        if not self._released:
            self._catalog.backend.remove_lease(self.lease_id)
            self._released = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False


class ChunkCatalog:
    """The DataManager analog (src/data_manager.rs:57-186)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        backend: CatalogBackend | None = None,
        max_size_bytes: int = MAX_SIZE_ON_DISK,
        lease_ttl_seconds: float | None = None,
    ):
        self.spark = spark
        self.root = root
        self.backend = backend or ParquetCatalogBackend(root)
        self.max_size_bytes = max_size_bytes
        # None = leases never expire (exact reference semantics: permits
        # held until release). Set a TTL in deployments where readers can
        # crash without releasing.
        self.lease_ttl_seconds = lease_ttl_seconds
        # in-memory fold of the log — the analog of the reference's
        # startup warm-up + HashMap cache (src/data_manager.rs:165-186);
        # refresh() re-reads if another process wrote. _snapshot_seq is
        # the version the fold was built at: the Delta-style commit in
        # _append always attempts exactly _snapshot_seq + 1, so every
        # precondition is provably checked against the state it commits
        # on top of.
        self._state_cache: dict[str, dict] | None = None
        self._snapshot_seq = 0

    #: consecutive NO-PROGRESS commit rounds tolerated before giving up.
    #: A CAS loss means another writer committed snapshot+1, so the
    #: frontier advanced and the counter resets — contention alone can
    #: never exhaust this; only a broken filesystem (conflicts with no
    #: visible new commit) can.
    COMMIT_RETRY_BUDGET = 32

    # -- state assembly ----------------------------------------------------
    def _current(self) -> dict[str, dict]:
        """Fold the log: last record per chunk_id wins (cached)."""
        if self._state_cache is None:
            state: dict[str, dict] = {}
            top = 0
            for rec in sorted(self.backend.read_records(), key=lambda r: r["seq"]):
                state[rec["chunk_id"]] = rec
                top = max(top, rec["seq"])
            self._state_cache = state
            self._snapshot_seq = top
        return self._state_cache

    def _append(self, rec: dict, revalidate=None) -> bool:
        """Delta-protocol commit: attempt version ``_snapshot_seq + 1``
        exactly — the version immediately after the state the caller's
        precondition was validated against. ANY concurrent commit
        (same seq or not) therefore collides: either our exclusive-create
        loses (``ChunkConflict``) or the racer's does. On a loss we
        re-read the log, let ``revalidate(current_state)`` re-check the
        caller's precondition against what actually committed, and retry
        at the new snapshot+1. Returns False when revalidation rejects
        (e.g. the chunk was registered, or the cap was filled, by the
        racer) — the caller's no-op/raise path.

        Progress: one writer wins each version, so a conflict implies
        system-wide progress; the retry budget counts only rounds where
        the snapshot did NOT advance (never under mere contention).
        The earlier clock-seeded-seq scheme made concurrent writers in
        different processes commit at disjoint seqs with no conflict at
        all — revalidation never ran, so two racers could both
        register the same chunk or jointly blow max_size_bytes."""
        def build(cur):
            if revalidate is not None and not revalidate(cur):
                return None
            return [rec]

        return self._append_batch(build) > 0

    def _append_batch(self, build) -> int:
        """The commit loop behind ``_append`` and ``register_chunks``:
        ``build(current_state)`` re-derives the records to commit from the
        freshest snapshot every attempt (returning None/[] for the no-op
        path), so preconditions are always validated against the exact
        state the commit lands on. All records of one batch share ONE
        version (seq = snapshot+1) — see ``append_records``. Returns the
        number of records committed."""
        stuck = 0
        while stuck < self.COMMIT_RETRY_BUDGET:
            self._current()  # ensure a snapshot exists to commit on top of
            before = self._snapshot_seq
            if self.backend.frontier_seq() > before:
                # commits landed since our fold. Rebase rather than commit
                # blind: a compaction may already have FOLDED the version
                # we would attempt, and exclusive-create cannot detect the
                # reuse of a vacated seq (it would fork history).
                self.refresh()
                self._current()
                if self._snapshot_seq <= before:
                    # the gap didn't fold: claimed-but-unreadable versions
                    # are ABORTED commits (crashed linkless-fallback
                    # writers) — adopt them as the commit base, or the
                    # frontier check wedges every future writer forever
                    adopted = self.backend.aborted_top(self._snapshot_seq)
                    if adopted > self._snapshot_seq:
                        self._snapshot_seq = adopted
                        stuck = 0
                    else:
                        stuck += 1
                else:
                    stuck = 0
                continue
            recs = build(self._current())
            if not recs:
                return 0
            for r in recs:
                r["seq"] = before + 1
            try:
                self.backend.append_records(recs)
            except ChunkConflict:
                self.refresh()
                self._current()
                stuck = stuck + 1 if self._snapshot_seq <= before else 0
                continue
            for r in recs:
                self._state_cache[r["chunk_id"]] = r
            self._snapshot_seq = before + 1
            return len(recs)
        raise ChunkConflict(
            f"commit retry budget exhausted "
            f"({self.COMMIT_RETRY_BUDGET} no-progress rounds)"
        )

    @property
    def version(self) -> int:
        """The latest committed seq this instance has observed — pass to
        ``state_as_of`` / ``list_chunks_as_of`` to address this point in
        history later."""
        self._current()
        return self._snapshot_seq

    def state_as_of(self, seq: int) -> dict[str, dict]:
        """Time travel: fold only log records with ``seq`` ≤ the given
        version — the catalog state as it was at that commit. The
        append-only log makes every historical state reconstructable
        (the lakehouse time-travel property); compaction (``compact``)
        truncates history, so pin a version before compacting if it
        must stay addressable."""
        state: dict[str, dict] = {}
        for rec in sorted(self.backend.read_records(), key=lambda r: r["seq"]):
            if rec["seq"] <= seq:
                state[rec["chunk_id"]] = rec
        return state

    def list_chunks_as_of(self, seq: int, state: str = ACTIVE) -> list[str]:
        return sorted(
            cid for cid, r in self.state_as_of(seq).items() if r["state"] == state
        )

    # -- tags (immutable named versions — the Iceberg-tag shape) -----------
    def create_tag(self, name: str) -> int:
        """Tag the latest version this instance has observed; returns the
        tagged seq. Tags are immutable (re-tagging conflicts) and
        durable; every compaction clamps its fold below the oldest tag,
        so ``state_as_of_tag`` stays exact forever after."""
        self._current()
        self.backend.create_tag(name, self._snapshot_seq)
        return self._snapshot_seq

    def list_tags(self) -> dict[str, int]:
        return self.backend.list_tags()

    def state_as_of_tag(self, name: str) -> dict[str, dict]:
        tags = self.backend.list_tags()
        if name not in tags:
            raise KeyError(f"unknown tag {name!r}")
        return self.state_as_of(tags[name])

    def list_chunks_as_of_tag(self, name: str, state: str = ACTIVE) -> list[str]:
        return sorted(
            cid
            for cid, r in self.state_as_of_tag(name).items()
            if r["state"] == state
        )

    def checkpoint(self, retain_last: int = 0) -> None:
        """Delta-style log checkpoint: fold history older than the last
        ``retain_last`` commits into one snapshot file, keep the tail
        verbatim. ``state_as_of`` stays exact for every version in the
        retained window; older versions degrade to their folded state.
        Bounds log length (and warm-up fold cost) without giving up
        recent time travel — the version-retention dial lk06 documents."""
        self.backend.compact(retain_last=retain_last)
        self.refresh()

    def refresh(self) -> None:
        """Drop the cache (pick up records from other writers)."""
        self._state_cache = None

    # -- R1/R2/R9: ingest --------------------------------------------------
    def register_chunk(self, meta: ChunkMeta) -> bool:
        """Admit a chunk (download_chunk analog, src/data_manager.rs:189-276).

        Returns False if the id is already present (idempotent — the
        Entry::Vacant dedupe, src/data_manager.rs:226-228). Raises
        MaxSizeAllocated if the cap would trip (src/data_manager.rs:229-239).
        """
        def admissible(cur: dict[str, dict]) -> bool:
            if meta.chunk_id in cur and cur[meta.chunk_id]["state"] != DELETED:
                return False
            total = sum(
                r["size_bytes"] for r in cur.values() if r["state"] != DELETED
            )
            if total + meta.size_bytes > self.max_size_bytes:
                raise MaxSizeAllocated(
                    total + meta.size_bytes, self.max_size_bytes
                )
            return True

        if not admissible(self._current()):
            return False
        # `admissible` doubles as the CAS revalidation: when another writer
        # wins the version race, the precondition re-runs against what
        # actually committed (duplicate -> False/no-op; cap -> raise)
        return self._append(
            {
                "dataset_id": meta.dataset_id,
                "chunk_id": meta.chunk_id,
                "block_start": meta.block_start,
                "block_end": meta.block_end,
                "files": json.dumps(meta.files, sort_keys=True),
                "size_bytes": meta.size_bytes,
                "state": ACTIVE,
                "seq": 0,  # assigned by _append at commit time (snapshot+1)
                "created_at": pa.scalar(int(time.time() * 1e6), pa.timestamp("us")).as_py(),
            },
            revalidate=admissible,
        )

    def register_chunks(self, metas: list[ChunkMeta]) -> int:
        """Bulk admission: the whole batch lands in ONE log commit (one
        version, one CAS file) — the backfill path. Registering 10⁶
        chunks one at a time costs 10⁶ commits and compaction churn;
        batched, it is ⌈10⁶/batch⌉ commits.

        Semantics match repeated ``register_chunk``: already-present ids
        (and repeats within the batch — first occurrence wins) are
        skipped as no-ops; ``MaxSizeAllocated`` raises if the batch's
        NET addition would trip the cap, admitting nothing. Returns the
        number of chunks actually admitted. The admissible subset is
        re-derived from the freshest snapshot on every CAS retry, so a
        racer's commits are respected exactly as in the single path."""
        now = pa.scalar(int(time.time() * 1e6), pa.timestamp("us")).as_py()

        def build(cur: dict[str, dict]) -> list[dict]:
            total = sum(
                r["size_bytes"] for r in cur.values() if r["state"] != DELETED
            )
            seen: set[str] = set()
            keep: list[ChunkMeta] = []
            add = 0
            for m in metas:
                if m.chunk_id in seen:
                    continue
                if m.chunk_id in cur and cur[m.chunk_id]["state"] != DELETED:
                    continue
                seen.add(m.chunk_id)
                keep.append(m)
                add += m.size_bytes
            if keep and total + add > self.max_size_bytes:
                raise MaxSizeAllocated(total + add, self.max_size_bytes)
            return [
                {
                    "dataset_id": m.dataset_id,
                    "chunk_id": m.chunk_id,
                    "block_start": m.block_start,
                    "block_end": m.block_end,
                    "files": json.dumps(m.files, sort_keys=True),
                    "size_bytes": m.size_bytes,
                    "state": ACTIVE,
                    "seq": 0,  # assigned by _append_batch (snapshot+1)
                    "created_at": now,
                }
                for m in keep
            ]

        return self._append_batch(build)

    # -- R3: list ----------------------------------------------------------
    def registered_chunks(self) -> set[str]:
        """Chunk ids present in ANY non-DELETED state (ACTIVE or
        PENDING_DELETE). This is the set whose data files must never be
        removed outside vacuum's lease-checked path: a PENDING_DELETE
        chunk may still be pinned by a live lease (R7's barrier), so
        rollback/cleanup code must treat it as present, not missing."""
        return {
            cid for cid, r in self._current().items() if r["state"] != DELETED
        }

    def list_chunks(self, state: str = ACTIVE) -> list[str]:
        return sorted(
            cid for cid, r in self._current().items() if r["state"] == state
        )

    # -- R4/R5: containment lookup (divergence D1: intended semantics) -----
    def find_chunks_df(self, dataset_id: str, block_number: int) -> DataFrame:
        """Containment lookup through the DataFrame path — for very large
        catalogs where the Python-side fold would be the bottleneck.

        The containment predicate applies on the RAW log scan, BELOW the
        latest-per-chunk fold: dataset_id and the block range are
        immutable per chunk (only ``state`` transitions across a chunk's
        records), so every record of a chunk matches or none do, and the
        fold over the filtered subset equals filtering the folded table.
        Filtering above the fold (the former shape) blocked pushdown
        entirely — the window stood between the predicate and the scan,
        so a 10⁶-chunk catalog was fully scanned per lookup. Now the
        predicate reaches ``PushedFilters`` and parquet min/max stats
        prune row groups (gated in tests/test_plans.py). Only the
        ``state`` filter stays above the fold."""
        from pyspark.sql import Window as W

        raw = self._raw_meta_df()
        if raw is None:
            return self._empty_meta_df()
        w = W.partitionBy("chunk_id").orderBy(F.col("seq").desc())
        return (
            raw.filter(
                (F.col("dataset_id") == dataset_id)
                & (F.col("block_start") <= block_number)
                & (F.lit(block_number) < F.col("block_end"))
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("state") == ACTIVE))
            .drop("_rn")
        )

    def find_chunk_meta(self, dataset_id: str, block_number: int) -> ChunkMeta | None:
        """Highest-seq containing chunk wins: streaming ingest registers one
        chunk per (bucket, epoch), so a bucket fed by several micro-batches
        has several ACTIVE chunks with identical [block_start, block_end).
        Picking the latest registration keeps the lookup deterministic;
        ``read_dataset`` (which unions every ACTIVE chunk) is the
        complete-read path for multi-epoch buckets."""
        best = None
        for r in self._current().values():
            if (
                r["dataset_id"] == dataset_id
                and r["state"] == ACTIVE
                and r["block_start"] <= block_number < r["block_end"]
                and (best is None or r["seq"] > best["seq"])
            ):
                best = r
        if best is None:
            return None
        return ChunkMeta(
            best["dataset_id"],
            best["chunk_id"],
            best["block_start"],
            best["block_end"],
            json.loads(best["files"]),
            best["size_bytes"],
        )

    # -- R12/R13: pin ------------------------------------------------------
    def find_chunk(self, dataset_id: str, block_number: int) -> ChunkRef | None:
        """find_chunk analog (src/data_manager.rs:95-121): containment
        lookup + read pin; None if absent or PENDING_DELETE (D4)."""
        meta = self.find_chunk_meta(dataset_id, block_number)
        if meta is None:
            return None
        lease_id = uuid.uuid4().hex
        self.backend.add_lease(lease_id, meta.chunk_id)
        # re-check state after lease: a delete scheduled concurrently makes
        # the chunk invisible (the try_acquire_owned failure path,
        # src/data_manager.rs:110). The re-check must read FRESH state:
        # lease-then-recheck is the cross-process barrier against vacuum
        # (vacuum reads leases before deleting, so either it sees this
        # lease, or this re-check sees its PENDING_DELETE flip) — a cached
        # read would reopen that race for multi-process readers.
        self.refresh()
        cur = self._current().get(meta.chunk_id)
        if cur is None or cur["state"] != ACTIVE:
            self.backend.remove_lease(lease_id)
            return None
        return ChunkRef(self, meta, lease_id)

    @contextmanager
    def pin(self, dataset_id: str, block_number: int):
        ref = self.find_chunk(dataset_id, block_number)
        try:
            yield ref
        finally:
            if ref is not None:
                ref.release()

    # -- R7: deferred delete ----------------------------------------------
    def schedule_delete(self, chunk_id: str) -> bool:
        """spawn_delete_chunk analog (src/data_manager.rs:124-162): flip to
        PENDING_DELETE; physical removal deferred to vacuum()."""
        cur = self._current().get(chunk_id)
        if cur is None or cur["state"] != ACTIVE:
            return False
        rec = dict(cur, state=PENDING_DELETE, seq=0)
        return self._append(
            rec,
            # racer already transitioned it (deleted/vacuumed): no-op
            revalidate=lambda now: now.get(chunk_id, {}).get("state") == ACTIVE,
        )

    # -- R7/R8: vacuum (the acquire_many barrier, src/data_manager.rs:141-144)
    def vacuum(self) -> list[str]:
        """Physically remove PENDING_DELETE chunks with zero live leases."""
        pinned = set(self.backend.live_leases(self.lease_ttl_seconds).values())
        removed = []
        for cid, r in self._current().items():
            if r["state"] == PENDING_DELETE and cid not in pinned:
                meta = ChunkMeta(
                    r["dataset_id"], cid, r["block_start"], r["block_end"],
                    json.loads(r["files"]), r["size_bytes"],
                )
                path = self.chunk_path(meta)
                if path.startswith(self.root):  # only managed dirs
                    self.backend.delete_chunk_files(path)
                if self._append(
                    dict(r, state=DELETED, seq=0),
                    # a racing vacuum already tombstoned it: no-op
                    revalidate=lambda now, cid=cid: now.get(cid, {}).get("state")
                    == PENDING_DELETE,
                ):
                    removed.append(cid)
        return sorted(removed)

    # -- R10: chunk_path (implements the todo!(), rocksdb_storage_engine.rs:140)
    def chunk_path(self, meta: ChunkMeta) -> str:
        files = meta.files
        if files:
            # single-location chunks: the manifest points directly at the
            # data (one file, or several files in one directory)
            paths = sorted(set(files.values()))
            if len(paths) == 1:
                return paths[0]
            dirs = sorted(set(os.path.dirname(p) for p in paths))
            if len(dirs) == 1:
                return dirs[0]
        return os.path.join(self.root, "data", meta.dataset_id, meta.chunk_id)

    # -- R11: storage accounting (implements the stub, rocksdb_storage_engine.rs:143-148)
    def total_size(self) -> int:
        return sum(
            r["size_bytes"]
            for r in self._current().values()
            if r["state"] != DELETED
        )

    # -- Spark query surface ----------------------------------------------
    def chunks_df(self) -> DataFrame:
        """The metadata table as a DataFrame (current state, log folded).

        Reads the metadata log directly as Parquet — at 10⁶ chunks this
        is a distributed scan + one window over O(#chunks) rows, never a
        driver-side fold (the Python-side `_current()` is reserved for
        single-chunk admission/lookup control flow).
        """
        from pyspark.sql import Window as W

        df = self._raw_meta_df()
        if df is None:
            return self._empty_meta_df()
        w = W.partitionBy("chunk_id").orderBy(F.col("seq").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _raw_meta_df(self) -> DataFrame | None:
        """The unfolded metadata log as a parquet scan (None if empty).

        ``ignoreCorruptFiles`` applies the same ABORTED-commit policy as
        the Python read path (``read_records``): a writer that crashed
        mid-copy on a linkless filesystem leaves a truncated commit file
        whose seq stays claimed but whose record never existed."""
        meta = self.meta_dir_path()
        if not any(
            f.endswith(".parquet") and not f.startswith(".tmp-")
            for f in os.listdir(meta)
        ):
            return None
        return (
            self.spark.read.option("ignoreCorruptFiles", "true").parquet(meta)
        )

    def _empty_meta_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            "dataset_id string, chunk_id string, block_start long, "
            "block_end long, files string, size_bytes long, state string, "
            "seq long, created_at timestamp",
        )

    def meta_dir_path(self) -> str:
        backend = self.backend
        if isinstance(backend, ParquetCatalogBackend):
            return backend.meta_dir
        raise NotImplementedError("chunks_df requires a parquet-backed catalog")

    def read_dataset(
        self,
        dataset_id: str,
        block_start: int | None = None,
        block_end: int | None = None,
    ) -> DataFrame | None:
        """Scan a whole dataset (or a block sub-range) as ONE DataFrame.

        The metadata filter prunes to the chunks overlapping
        [block_start, block_end) — the relational analog of the
        reference's range-index key order (SURVEY §1.3) — and only those
        chunks' files are read. Returns None if nothing matches.
        """
        metas = [
            r
            for r in self._current().values()
            if r["dataset_id"] == dataset_id
            and r["state"] == ACTIVE
            and (block_end is None or r["block_start"] < block_end)
            and (block_start is None or block_start < r["block_end"])
        ]
        if not metas:
            return None
        paths = [
            self.chunk_path(
                ChunkMeta(
                    r["dataset_id"], r["chunk_id"], r["block_start"],
                    r["block_end"], json.loads(r["files"]), r["size_bytes"],
                )
            )
            for r in sorted(metas, key=lambda r: r["block_start"])
        ]
        return self.spark.read.parquet(*paths)

    def read_chunk(self, dataset_id: str, block_number: int) -> DataFrame | None:
        """Resolve + scan: the E1 lifecycle end-to-end (SURVEY §3).

        The lease is held for the DataFrame's LIFETIME (released when the
        DataFrame is garbage-collected), so vacuum cannot remove the files
        out from under a pending scan. Callers needing deterministic
        release use ``pin()`` directly.
        """
        import weakref

        ref = self.find_chunk(dataset_id, block_number)
        if ref is None:
            return None
        df = self.spark.read.parquet(ref.path())
        weakref.finalize(df, ref.release)
        return df
