"""D4 invariants under concurrent pin-holders and a vacuum loop.

The reference enforces "no delete while readers hold the chunk" with
in-process semaphore permits (src/data_manager.rs:95-162); the durable
analog here is lease files + the lease-then-recheck barrier in
``find_chunk``. These tests interleave real reader threads (each with
its OWN catalog instance over the shared root — the multi-process
topology) with a writer running schedule_delete + vacuum, and assert:

  1. a pinned chunk's files exist for the whole pin lifetime (vacuum
     never removes under a live lease);
  2. a chunk is never pinnable after its PENDING_DELETE flip is visible
     (D4 invisibility);
  3. once all pins are released, vacuum drains every scheduled delete
     and physical files are gone;
  4. the metadata log survives concurrent reader folds racing the
     writer's auto-compaction.
"""

from __future__ import annotations

import os
import random
import threading
import time

from datalake_worker_spark.catalog import ChunkCatalog, ChunkMeta

N_CHUNKS = 24
N_READERS = 4
RUN_SECONDS = 6.0


def _mk_chunk(root: str, i: int) -> ChunkMeta:
    cid = f"c{i:03d}"
    d = os.path.join(root, "data", "ds", cid)
    os.makedirs(d, exist_ok=True)
    for part in ("a", "b"):
        with open(os.path.join(d, f"{part}.txt"), "w") as fh:
            fh.write(f"{cid}-{part}\n")
    files = {p: os.path.join(d, f"{p}.txt") for p in ("a", "b")}
    return ChunkMeta("ds", cid, i * 100, (i + 1) * 100, files, 10)


def test_concurrent_pin_vacuum(spark, tmp_path):
    root = str(tmp_path)
    writer = ChunkCatalog(spark, root)
    for i in range(N_CHUNKS):
        assert writer.register_chunk(_mk_chunk(root, i))

    stop = threading.Event()
    errors: list[str] = []
    pins_ok = [0] * N_READERS
    pinned_after_flip: list[str] = []
    flipped_lock = threading.Lock()
    # chunk_ids whose PENDING_DELETE flip is durable (added AFTER
    # schedule_delete returns)
    flipped: set[str] = set()

    def reader(idx: int) -> None:
        rng = random.Random(1000 + idx)
        cat = ChunkCatalog(spark, root)
        while not stop.is_set():
            block = rng.randrange(N_CHUNKS * 100)
            # snapshot BEFORE the pin attempt: anything in it was durably
            # flipped before find_chunk began, so a successful pin on it
            # is a genuine D4 violation (no false positives: the set only
            # gains members after their flip is durable)
            with flipped_lock:
                snap = set(flipped)
            cat.refresh()
            ref = cat.find_chunk("ds", block)
            if ref is None:
                continue
            try:
                if ref.meta.chunk_id in snap:
                    pinned_after_flip.append(ref.meta.chunk_id)
                p = ref.path()
                if not os.path.isdir(p):
                    errors.append(f"pin acquired but path missing: {p}")
                time.sleep(rng.uniform(0.001, 0.01))
                if not os.path.isdir(p):
                    errors.append(f"files vanished while pinned: {p}")
                pins_ok[idx] += 1
            finally:
                ref.release()

    def writer_loop() -> None:
        order = list(range(N_CHUNKS))
        random.Random(7).shuffle(order)
        deadline = time.time() + RUN_SECONDS
        for i in order:
            cid = f"c{i:03d}"
            assert writer.schedule_delete(cid)
            with flipped_lock:
                flipped.add(cid)
            writer.vacuum()
            time.sleep(max(0.0, (deadline - time.time()) / max(1, N_CHUNKS)))
        while time.time() < deadline:
            writer.vacuum()
            time.sleep(0.05)

    threads = [
        threading.Thread(target=reader, args=(i,), daemon=True)
        for i in range(N_READERS)
    ]
    wt = threading.Thread(target=writer_loop, daemon=True)
    for t in threads:
        t.start()
    wt.start()
    wt.join()
    stop.set()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "reader thread hung"

    assert not errors, errors[:5]
    # note: a pin STARTED before the flip legitimately overlaps it; the
    # flipped set is populated pre-flip, so only post-flip pins land here
    assert not pinned_after_flip, (
        f"chunks pinned after PENDING_DELETE was durable: "
        f"{sorted(set(pinned_after_flip))}"
    )
    # the interleaving must have actually exercised pins
    assert sum(pins_ok) > 0

    # drain: all leases are released, so vacuum removes everything
    removed_total = set()
    for _ in range(10):
        writer.refresh()
        removed_total.update(writer.vacuum())
        if not writer.list_chunks("PENDING_DELETE"):
            break
    writer.refresh()
    assert writer.list_chunks() == []
    assert writer.total_size() == 0
    data_root = os.path.join(root, "data", "ds")
    leftovers = os.listdir(data_root) if os.path.isdir(data_root) else []
    assert leftovers == [], f"physical dirs survived vacuum: {leftovers}"


def test_lease_ttl_reaps_crashed_reader(spark, tmp_path):
    """A reader that dies without releasing must not block vacuum forever:
    with a TTL the stale lease is reaped and the chunk is removed."""
    root = str(tmp_path)
    cat = ChunkCatalog(spark, root, lease_ttl_seconds=0.2)
    assert cat.register_chunk(_mk_chunk(root, 0))
    ref = cat.find_chunk("ds", 50)
    assert ref is not None
    assert cat.schedule_delete("c000")
    # lease is live: vacuum must skip
    assert cat.vacuum() == []
    assert os.path.isdir(ref.path())
    time.sleep(0.25)  # lease expires un-released (crashed reader)
    assert cat.vacuum() == ["c000"]
    assert not os.path.isdir(ref.path())


def test_cas_commit_rejects_version_race(spark, tmp_path):
    """Writers with STALE snapshots (folded before the racer's commit —
    the real multi-process race): the Delta-protocol commit at
    snapshot+1 must collide, exclusive-create picks exactly one winner
    per version, and the loser rebases + revalidates. Both
    registrations land, history has no forked seq, and the fold is
    identical from both instances."""
    root = str(tmp_path / "cat")
    a = ChunkCatalog(spark, root)
    b = ChunkCatalog(spark, root)
    b._current()  # b folds the EMPTY log: snapshot version 0
    ma = ChunkMeta("ds", "ca", 0, 10, {}, 1)
    mb = ChunkMeta("ds", "cb", 10, 20, {}, 1)
    assert a.register_chunk(ma)  # commits version 1
    # b's stale snapshot makes it attempt version 1 too -> CAS conflict
    # -> rebase -> revalidate -> commit at 2
    assert b.register_chunk(mb)
    seqs = [r["seq"] for r in a.backend.read_records()]
    assert seqs == [1, 2], f"forked/gapped history: {seqs}"
    a.refresh(); b.refresh()
    assert a.list_chunks() == b.list_chunks() == ["ca", "cb"]

    # duplicate-register race: c folds BEFORE a registers "cc"; c's
    # pre-check passes on the stale fold, the commit collides, and the
    # revalidation sees the racer's identical chunk -> idempotent no-op
    c = ChunkCatalog(spark, root)
    c._current()
    assert a.register_chunk(ChunkMeta("ds", "cc", 20, 30, {}, 1))
    assert c.register_chunk(ChunkMeta("ds", "cc", 20, 30, {}, 1)) is False
    assert len(c.backend.read_records()) == 3  # no duplicate commit landed

    # cap race: room for exactly one more byte-sized chunk — both
    # writers' pre-checks pass on the same snapshot, one commit wins,
    # the loser's revalidation raises the cap error
    import pytest

    from datalake_worker_spark.errors import MaxSizeAllocated

    d1 = ChunkCatalog(spark, root, max_size_bytes=4)
    d2 = ChunkCatalog(spark, root, max_size_bytes=4)
    d1._current(); d2._current()  # same snapshot: 3 bytes used of 4
    assert d1.register_chunk(ChunkMeta("ds", "cd", 30, 40, {}, 1))
    with pytest.raises(MaxSizeAllocated):
        d2.register_chunk(ChunkMeta("ds", "ce", 40, 50, {}, 1))


def test_parallel_writers_all_commits_survive(spark, tmp_path):
    """8 threads x 12 registrations through SEPARATE catalog instances
    over one root, all starting from the same snapshot: every chunk must
    be admitted exactly once, and the Delta protocol (commit at exactly
    snapshot+1) must yield a DENSE, fork-free version history."""
    root = str(tmp_path / "cat")
    cats = [ChunkCatalog(spark, root) for _ in range(8)]
    for c in cats:
        c._current()  # all start from the same (empty) snapshot
    errs = []

    def writer(wid: int):
        try:
            for i in range(12):
                assert cats[wid].register_chunk(
                    ChunkMeta("ds", f"w{wid}_{i}", 0, 10, {}, 1)
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    fresh = ChunkCatalog(spark, root)
    assert len(fresh.list_chunks()) == 96
    seqs = [r["seq"] for r in fresh.backend.read_records()]
    # dense versions 1..96: every commit rebased onto the real frontier,
    # so no writer ever committed blind past a concurrent commit
    assert sorted(seqs) == list(range(1, 97)), f"non-dense history: {seqs}"


def test_commit_cas_on_linkless_filesystem(spark, tmp_path, monkeypatch):
    """Filesystems that reject hard links (EPERM on some FUSE/network
    mounts): append_record must fall back to O_CREAT|O_EXCL with the
    SAME exclusivity — a winner commits, the racer's attempt at the
    same version raises ChunkConflict (not a silent double-commit)."""
    import pytest

    from datalake_worker_spark.errors import ChunkConflict

    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)

    def no_link(src, dst, **kw):
        raise PermissionError("hard links not permitted on this mount")

    monkeypatch.setattr(os, "link", no_link)
    assert cat.register_chunk(ChunkMeta("ds", "ca", 0, 10, {}, 1))
    cat.refresh()
    assert cat.list_chunks() == ["ca"]  # fallback wrote a readable commit

    # direct double-commit at one version: second O_EXCL create must lose
    rec = dict(cat.backend.read_records()[-1])
    rec["seq"] = rec["seq"] + 1
    cat.backend.append_record(dict(rec))
    with pytest.raises(ChunkConflict):
        cat.backend.append_record(dict(rec))


def test_auto_compaction_honors_checkpoint_retention(spark, tmp_path):
    """checkpoint(retain_last=K) promises state_as_of stays exact inside
    the retained window; the 65th commit's auto-compaction must not fold
    that window away (it honors the retention floor)."""
    from datalake_worker_spark.catalog import ACTIVE, PENDING_DELETE

    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    for i in range(6):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i:02d}", i, i + 1, {}, 1))
    v_registered = cat.version  # 6
    assert cat.schedule_delete("c00")
    v_mid = cat.version  # 7: c00 pending, c01 still active
    assert cat.schedule_delete("c01")
    # retain the two delete transitions verbatim; fold the older prefix
    cat.checkpoint(retain_last=cat.version - v_registered)
    # flood commits past AUTO_COMPACT_AT to force auto-compactions
    for i in range(10, 10 + cat.backend.AUTO_COMPACT_AT + 10):
        assert cat.register_chunk(ChunkMeta("ds", f"f{i:03d}", i, i + 1, {}, 1))
    cat.refresh()
    # v_mid sits INSIDE the checkpoint-retained window: it must still
    # separate the two transitions exactly (c00 flipped, c01 not yet).
    # Pre-fix, the 65th commit auto-compacted with retain_last=0,
    # folding c01 to its PENDING_DELETE record at seq 8 and erasing its
    # ACTIVE state from every version below 8.
    st = cat.state_as_of(v_mid)
    assert st["c00"]["state"] == PENDING_DELETE
    assert st["c01"]["state"] == ACTIVE, "retained window was folded away"


def test_bulk_register_one_commit(spark, tmp_path):
    """register_chunks admits a whole batch under ONE version: one CAS
    file, version advances by 1, time travel sees the batch atomically,
    re-registration is a no-op, and the cap applies to the batch's net
    addition atomically."""
    import pytest

    from datalake_worker_spark.errors import MaxSizeAllocated

    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    metas = [ChunkMeta("ds", f"b{i:04d}", i, i + 1, {}, 1) for i in range(500)]
    v0 = cat.version
    assert cat.register_chunks(metas) == 500
    assert cat.version == v0 + 1
    meta_dir = os.path.join(root, "_meta")
    canon = [f for f in os.listdir(meta_dir) if f.split(".")[0].isdigit()]
    assert len(canon) == 1, canon  # one log file for the whole batch
    fresh = ChunkCatalog(spark, root)
    assert len(fresh.list_chunks()) == 500
    assert len(fresh.state_as_of(v0)) == 0       # atomic appearance
    assert len(fresh.state_as_of(v0 + 1)) == 500
    # idempotent: the whole batch is already present
    assert cat.register_chunks(metas) == 0
    # mixed batch: one new + dups + an in-batch repeat -> admits one
    mixed = [metas[0], ChunkMeta("ds", "new1", 900, 901, {}, 1),
             ChunkMeta("ds", "new1", 900, 901, {}, 1)]
    assert cat.register_chunks(mixed) == 1
    # cap is atomic over the batch: net addition 3 > remaining 2 -> nothing lands
    capped = ChunkCatalog(spark, str(tmp_path / "cap"), max_size_bytes=2)
    with pytest.raises(MaxSizeAllocated):
        capped.register_chunks(
            [ChunkMeta("ds", f"c{i}", i, i + 1, {}, 1) for i in range(3)]
        )
    assert capped.list_chunks() == []


def test_bulk_register_racing_writers(spark, tmp_path):
    """Two bulk writers with overlapping batches from the same snapshot:
    CAS + rebuilt admissible subset admit every chunk exactly once."""
    root = str(tmp_path / "cat")
    a = ChunkCatalog(spark, root)
    b = ChunkCatalog(spark, root)
    a._current(); b._current()  # same (empty) snapshot
    batch_a = [ChunkMeta("ds", f"x{i:03d}", i, i + 1, {}, 1) for i in range(40)]
    batch_b = [ChunkMeta("ds", f"x{i:03d}", i, i + 1, {}, 1) for i in range(20, 60)]
    n_a = a.register_chunks(batch_a)
    n_b = b.register_chunks(batch_b)  # stale snapshot -> conflict -> rebuild
    assert n_a == 40
    assert n_b == 20, n_b  # only the non-overlapping suffix
    fresh = ChunkCatalog(spark, root)
    assert len(fresh.list_chunks()) == 60
    recs = fresh.backend.read_records()
    assert len(recs) == 60
    assert len({r["seq"] for r in recs}) == 2  # two bulk versions


def test_bulk_register_equals_sequential(spark, tmp_path):
    """Bulk admission must produce the same folded state as registering
    the same batch sequentially (modulo seq granularity)."""
    m = [ChunkMeta("ds", f"e{i:02d}", i * 10, (i + 1) * 10, {}, i + 1) for i in range(25)]
    a = ChunkCatalog(spark, str(tmp_path / "a"))
    b = ChunkCatalog(spark, str(tmp_path / "b"))
    assert a.register_chunks(m) == 25
    for meta in m:
        assert b.register_chunk(meta)
    fa = {c: (r["state"], r["size_bytes"], r["block_start"], r["block_end"])
          for c, r in a._current().items()}
    fb = {c: (r["state"], r["size_bytes"], r["block_start"], r["block_end"])
          for c, r in b._current().items()}
    assert fa == fb
    assert a.total_size() == b.total_size()
    assert a.list_chunks() == b.list_chunks()
    assert a.version == 1 and b.version == 25


def test_auto_compaction_still_folds_without_checkpoint(spark, tmp_path):
    """With no checkpoint retention promise, auto-compaction must keep
    folding to latest-per-chunk (bounded log), not retain all history."""
    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    n = cat.backend.AUTO_COMPACT_AT + 10
    for i in range(n):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i:03d}", i, i + 1, {}, 1))
    for i in range(n):
        assert cat.schedule_delete(f"c{i:03d}")
    cat.refresh()
    recs = cat.backend.read_records()
    # 2n commits happened; a folded log holds ~latest-per-chunk plus the
    # small post-compaction tail — far fewer than the 2n raw records
    assert len(recs) < n + cat.backend.AUTO_COMPACT_AT, len(recs)
    assert len(cat.list_chunks("PENDING_DELETE")) == n


def test_aborted_commit_tolerated_everywhere(spark, tmp_path):
    """A truncated (crashed-mid-copy) commit file is an ABORTED commit:
    its seq stays claimed (frontier anchors on the filename, so the
    version is never reused) but both the Python fold and the Spark
    metadata scan must read through it."""
    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    for i in range(3):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i}", i, i + 1, {}, 1))
    # simulate the linkless-fallback crash: version 4 visible but empty
    meta = os.path.join(root, "_meta")
    with open(os.path.join(meta, f"{4:020d}.parquet"), "wb") as fh:
        fh.write(b"PAR1garbage")
    cat.refresh()
    assert cat.list_chunks() == ["c0", "c1", "c2"]          # Python fold
    assert cat.chunks_df().count() == 3                      # Spark scan
    assert cat.backend.frontier_seq() == 4                   # seq stays claimed
    # the next commit rebases past the aborted version
    assert cat.register_chunk(ChunkMeta("ds", "c9", 9, 10, {}, 1))
    assert cat.backend.read_records()[-1]["seq"] == 5


def test_compaction_folds_around_aborted_commit(spark, tmp_path):
    """One crashed linkless-fallback writer must not disable compaction
    forever: the fold reads around the unreadable file, deletes only
    what it folded, and leaves the aborted file anchoring its seq."""
    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    assert cat.register_chunk(ChunkMeta("ds", "c0", 0, 1, {}, 1))
    meta = os.path.join(root, "_meta")
    aborted = os.path.join(meta, f"{2:020d}.parquet")
    with open(aborted, "wb") as fh:
        fh.write(b"PAR1garbage")
    n = cat.backend.AUTO_COMPACT_AT + 10
    for i in range(1, n):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i}", i, i + 1, {}, 1))
    files = [f for f in os.listdir(meta) if f.endswith(".parquet")]
    # auto-compaction ran despite the aborted file: log stayed bounded
    assert len(files) < cat.backend.AUTO_COMPACT_AT, len(files)
    assert os.path.exists(aborted)  # left in place, seq stays claimed
    cat.refresh()
    assert len(cat.list_chunks()) == n


def test_slow_inflight_commit_not_adopted(spark, tmp_path):
    """A claimed-but-unreadable commit whose writer is merely SLOW (the
    linkless O_EXCL copy is still in flight) must not be classified
    aborted: the adopter would otherwise commit at seq+1 with its
    preconditions validated against a state excluding the slow writer's
    records. The adopter must wait the slow commit out and rebase ON TOP
    of it — both commits' records survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    from datalake_worker_spark.catalog import _META_SCHEMA

    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    for i in range(3):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i}", i, i + 1, {}, 1))
    meta = os.path.join(root, "_meta")
    slow = os.path.join(meta, f"{4:020d}.parquet")
    with open(slow, "wb") as fh:  # copy in flight: visible, truncated
        fh.write(b"PAR1garbage")
    cat.backend.ABORTED_GRACE_SECONDS = 1.5

    def finish_slow_copy():
        time.sleep(0.6)
        rec = {
            "dataset_id": "ds", "chunk_id": "slow", "block_start": 100,
            "block_end": 101, "files": "{}", "size_bytes": 1,
            "state": "ACTIVE", "seq": 4,
            "created_at": datetime.now(timezone.utc).replace(tzinfo=None),
        }
        tmp = slow + ".tmp"
        pq.write_table(pa.Table.from_pylist([rec], schema=_META_SCHEMA), tmp)
        os.replace(tmp, slow)
        with open(slow[: -len(".parquet")] + ".done", "w"):
            pass

    t = threading.Thread(target=finish_slow_copy)
    t.start()
    try:
        # must block past the slow writer, fold its commit, land at seq 5
        assert cat.register_chunk(ChunkMeta("ds", "c9", 9, 10, {}, 1))
    finally:
        t.join()
    cat.refresh()
    assert sorted(cat.list_chunks()) == ["c0", "c1", "c2", "c9", "slow"]
    assert cat.backend.read_records()[-1]["seq"] == 5


def test_crashed_commit_adopted_after_grace(spark, tmp_path):
    """A markerless unreadable commit whose bytes stay frozen past the
    grace window IS adopted (the crashed-writer liveness path) — and the
    completion marker short-circuits: an unreadable file WITH its marker
    is never classified aborted."""
    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    assert cat.register_chunk(ChunkMeta("ds", "c0", 0, 1, {}, 1))
    meta = os.path.join(root, "_meta")
    cat.backend.ABORTED_GRACE_SECONDS = 0.3
    dead = os.path.join(meta, f"{2:020d}.parquet")
    with open(dead, "wb") as fh:
        fh.write(b"PAR1garbage")
    assert cat.backend._probe_commit(dead) == "aborted"
    with open(dead[: -len(".parquet")] + ".done", "w"):
        pass
    assert cat.backend._probe_commit(dead) == "complete"
    os.remove(dead[: -len(".parquet")] + ".done")
    # adoption end-to-end: next commit rebases past the dead version
    assert cat.register_chunk(ChunkMeta("ds", "c9", 9, 10, {}, 1))
    assert cat.backend.read_records()[-1]["seq"] == 3


def test_registered_chunks_includes_pending_delete(spark, tmp_path):
    """registered_chunks() = ids in any non-DELETED state: the set ingest
    rollback may NOT touch (a PENDING_DELETE chunk can still be
    lease-pinned; only vacuum's lease-checked path deletes its files)."""
    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    assert cat.register_chunk(ChunkMeta("ds", "keep", 0, 1, {}, 1))
    assert cat.register_chunk(ChunkMeta("ds", "pend", 1, 2, {}, 1))
    assert cat.schedule_delete("pend")
    assert cat.registered_chunks() == {"keep", "pend"}
    cat.vacuum()
    cat.refresh()
    assert cat.registered_chunks() == {"keep"}


def test_concurrent_tags_vs_compaction_exactness(spark, tmp_path):
    """The r7 two-phase tag/fold handshake under real interleaving:
    taggers race a writer that registers, flips deletes, compacts, and
    drops old tags. Invariant: every create_tag that REPORTED success
    must be exact — state_as_of_tag equals the ground-truth fold of the
    writer's own operation log at that seq. Rejections (ChunkConflict)
    are legitimate; silent inexactness is the bug the handshake closes."""
    import random as _rnd

    from datalake_worker_spark.errors import ChunkConflict

    root = str(tmp_path)
    writer = ChunkCatalog(spark, root)
    stop = threading.Event()
    lock = threading.Lock()
    tagged: list[tuple[str, int]] = []
    errors: list[str] = []

    def tagger(idx: int) -> None:
        cat = ChunkCatalog(spark, root)
        k = 0
        # BOUNDED churn: an unbounded 1 ms loop created tags faster than
        # the writer's Spark-paced iterations consumed wall-clock, and
        # every tag makes list_tags/create_tag's directory work dearer —
        # a feedback loop that once grew the tag dir to ~18k files and
        # the test to >30 min. 200 tags x 20 ms keeps the interleaving
        # pressure while bounding the race surface.
        while not stop.is_set() and k < 200:
            name = f"t{idx}-{k}"
            k += 1
            try:
                seq = cat.create_tag(name)
                with lock:
                    tagged.append((name, seq))
            except ChunkConflict:
                pass  # raced a fold or a name: honest, loud rejection
            except Exception as exc:  # noqa: BLE001
                errors.append(f"tagger{idx}: {exc!r}")
                return
            time.sleep(0.02)

    threads = [threading.Thread(target=tagger, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()

    # ground truth: (seq, chunk_id, state) in writer commit order
    truth_log: list[tuple[int, str, str]] = []
    rng = _rnd.Random(11)
    try:
        for i in range(120):
            writer.register_chunk(_mk_chunk(root, i))
            truth_log.append((writer.version, f"c{i:03d}", "ACTIVE"))
            if i >= 8 and i % 3 == 0:
                victim = f"c{i - 8:03d}"
                if writer.schedule_delete(victim):
                    truth_log.append((writer.version, victim, "PENDING_DELETE"))
            if i % 10 == 5:
                writer.backend.compact()
            if i % 7 == 6:
                # drop an old tag so later folds can advance their cutoff
                tags = writer.list_tags()
                if tags:
                    writer.backend.delete_tag(min(tags, key=tags.get))
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors

    def truth_at(seq: int) -> dict[str, str]:
        state: dict[str, str] = {}
        for s, cid, st in truth_log:
            if s <= seq:
                state[cid] = st
        return state

    writer.refresh()
    surviving = writer.list_tags()
    alive = [(n, s) for n, s in tagged if n in surviving]
    # exactness is per-tag independent — verify a deterministic spread
    # of at most 40 survivors (each check is a full fold read) instead
    # of every one
    alive.sort(key=lambda ns: ns[1])
    step = max(1, len(alive) // 40)
    checked = 0
    for name, seq in alive[::step]:
        assert surviving[name] == seq, (name, seq, surviving[name])
        got = {cid: r["state"] for cid, r in writer.state_as_of_tag(name).items()}
        assert got == truth_at(seq), (
            f"tag {name}@{seq} is INEXACT: "
            f"missing={set(truth_at(seq)) - set(got)} "
            f"extra={set(got) - set(truth_at(seq))}"
        )
        checked += 1
    assert checked >= 10, f"only {checked} surviving tags verified — churn too high?"
