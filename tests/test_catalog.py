"""Lake-core lifecycle property tests (SURVEY.md §5.3): the reference's
DataManager semantics — idempotent admission, cap, pin/lease barrier,
pending-delete invisibility (D4), containment lookup (D1) — verified
against a brute-force Python model."""

from __future__ import annotations

import os

import pytest

from datalake_worker_spark.catalog import (
    ACTIVE,
    DELETED,
    PENDING_DELETE,
    ChunkCatalog,
    ChunkMeta,
)
from datalake_worker_spark.errors import MaxSizeAllocated


@pytest.fixture()
def cat(spark, tmp_path):
    return ChunkCatalog(spark, str(tmp_path / "cat"))


def _meta(i: int, start: int, end: int, size: int = 10, ds: str = "d1") -> ChunkMeta:
    return ChunkMeta(ds, f"chunk{i:02d}", start, end, {"f": f"/tmp/none{i}"}, size)


def test_register_idempotent(cat):
    assert cat.register_chunk(_meta(1, 0, 100)) is True
    # same id again → vacancy check rejects (src/data_manager.rs:226-228)
    assert cat.register_chunk(_meta(1, 0, 100)) is False
    assert cat.list_chunks() == ["chunk01"]


def test_containment_lookup_boundaries(cat):
    # reference README index shape: 0..100, 101..120, 121..1000
    cat.register_chunk(_meta(1, 0, 100))
    cat.register_chunk(_meta(2, 101, 120))
    cat.register_chunk(_meta(3, 121, 1000))
    # half-open [start, end): end excluded, start included (D1 semantics)
    assert cat.find_chunk_meta("d1", 0).chunk_id == "chunk01"
    assert cat.find_chunk_meta("d1", 99).chunk_id == "chunk01"
    assert cat.find_chunk_meta("d1", 100) is None  # gap: 100 ∉ [0,100) ∪ [101,120)
    assert cat.find_chunk_meta("d1", 101).chunk_id == "chunk02"
    assert cat.find_chunk_meta("d1", 119).chunk_id == "chunk02"
    assert cat.find_chunk_meta("d1", 120) is None
    assert cat.find_chunk_meta("d1", 999).chunk_id == "chunk03"
    assert cat.find_chunk_meta("d1", 1000) is None
    assert cat.find_chunk_meta("other", 50) is None  # dataset isolation


def test_overlapping_chunks_latest_registration_wins(cat):
    """Multi-epoch ingest registers several ACTIVE chunks with the same
    [block_start, block_end); containment must deterministically return
    the latest registration (highest seq), not dict order."""
    cat.register_chunk(_meta(1, 0, 100))
    cat.register_chunk(_meta(2, 0, 100))
    cat.register_chunk(_meta(3, 0, 100))
    for b in (0, 50, 99):
        assert cat.find_chunk_meta("d1", b).chunk_id == "chunk03"
    # deleting the winner falls back to the next-latest
    cat.schedule_delete("chunk03")
    assert cat.find_chunk_meta("d1", 50).chunk_id == "chunk02"


def test_containment_vs_bruteforce(cat):
    """Property: find == brute-force containment over a random layout."""
    import random

    rng = random.Random(42)
    chunks = []
    pos = 0
    for i in range(20):
        gap = rng.randint(0, 5)
        width = rng.randint(1, 50)
        chunks.append((i, pos + gap, pos + gap + width))
        pos += gap + width
    for i, s, e in chunks:
        cat.register_chunk(_meta(i, s, e))
    for probe in range(0, pos + 10):
        expect = next(
            (f"chunk{i:02d}" for i, s, e in chunks if s <= probe < e), None
        )
        got = cat.find_chunk_meta("d1", probe)
        assert (got.chunk_id if got else None) == expect, probe


def test_size_cap_enforced(spark, tmp_path):
    cat = ChunkCatalog(spark, str(tmp_path / "cap"), max_size_bytes=100)
    cat.register_chunk(_meta(1, 0, 10, size=60))
    with pytest.raises(MaxSizeAllocated):
        cat.register_chunk(_meta(2, 10, 20, size=50))
    # under-cap admission still works after the failure
    assert cat.register_chunk(_meta(3, 20, 30, size=40)) is True
    assert cat.total_size() == 100


def test_pin_blocks_vacuum_and_d4_invisibility(cat):
    cat.register_chunk(_meta(1, 0, 100))
    ref = cat.find_chunk("d1", 50)
    assert ref is not None
    assert cat.schedule_delete("chunk01") is True
    # D4: scheduling the delete makes the chunk invisible to NEW readers
    assert cat.find_chunk("d1", 50) is None
    # the existing pin holds: vacuum must not remove it (acquire_many barrier)
    assert cat.vacuum() == []
    state = {r["chunk_id"]: r["state"] for r in cat.backend.read_records()[-1:]}
    # release the last pin → vacuumable
    ref.release()
    assert cat.vacuum() == ["chunk01"]
    assert cat.list_chunks(DELETED) == ["chunk01"]
    assert cat.list_chunks(ACTIVE) == []


def test_schedule_delete_nonexistent(cat):
    assert cat.schedule_delete("nope") is False
    cat.register_chunk(_meta(1, 0, 10))
    cat.schedule_delete("chunk01")
    # double-delete is a no-op (already PENDING_DELETE)
    assert cat.schedule_delete("chunk01") is False


def test_pin_context_manager(cat):
    cat.register_chunk(_meta(1, 0, 100))
    with cat.pin("d1", 5) as ref:
        assert ref is not None
        assert cat.backend.live_leases()
    assert not cat.backend.live_leases()  # released on exit


def test_read_chunk_end_to_end(spark, tmp_path, sf_dir):
    """E1 lifecycle: register real parquet → find → pin → scan (SURVEY §3)."""
    cat = ChunkCatalog(spark, str(tmp_path / "e1"))
    path = os.path.join(sf_dir, "nation.parquet")
    cat.register_chunk(
        ChunkMeta("tpch", "nat", 0, 1000, {"nation.parquet": path}, 100)
    )
    df = cat.read_chunk("tpch", 500)
    assert df is not None and df.count() == 25


def test_read_dataset_prunes_chunks(spark, tmp_path, sf_dir):
    """read_dataset unions only the chunks overlapping the block range."""
    cat = ChunkCatalog(spark, str(tmp_path / "ds"))
    for i, tbl in enumerate(["region", "nation", "supplier"]):
        cat.register_chunk(
            ChunkMeta(
                "d", f"c{i}", i * 100, (i + 1) * 100,
                {f"{tbl}.parquet": os.path.join(sf_dir, f"{tbl}.parquet")}, 1,
            )
        )
    # whole dataset: region(5) + nation(25) + supplier(10) — schemas differ,
    # so scope the assertion per-range instead of unioning all three
    only_nation = cat.read_dataset("d", 100, 200)
    assert only_nation.count() == 25
    boundary = cat.read_dataset("d", 199, 201)  # overlaps chunks 1 and 2
    assert boundary is not None
    assert cat.read_dataset("d", 300, 400) is None  # no chunk
    assert cat.read_dataset("nope") is None  # dataset isolation


def test_chunks_df_folds_log(cat, spark):
    cat.register_chunk(_meta(1, 0, 10))
    cat.register_chunk(_meta(2, 10, 20))
    cat.schedule_delete("chunk01")
    df = cat.chunks_df()
    rows = {r["chunk_id"]: r["state"] for r in df.collect()}
    assert rows == {"chunk01": PENDING_DELETE, "chunk02": ACTIVE}


def test_lease_ttl_expires_crashed_readers(spark, tmp_path):
    """A lease never released (crashed reader) stops blocking vacuum once
    it ages past the TTL."""
    import time as _time

    cat = ChunkCatalog(spark, str(tmp_path / "ttl"), lease_ttl_seconds=0.5)
    cat.register_chunk(_meta(1, 0, 100))
    ref = cat.find_chunk("d1", 50)  # never released — simulated crash
    assert ref is not None
    cat.schedule_delete("chunk01")
    assert cat.vacuum() == []  # lease still fresh
    _time.sleep(0.6)
    assert cat.vacuum() == ["chunk01"]  # expired → reaped → vacuumable
    assert cat.backend.live_leases() == {}


def test_external_writer_visible_after_refresh(spark, tmp_path):
    """Two catalog handles on one root: writes by one are visible to the
    other after refresh() (single-writer cache is authoritative until
    told otherwise)."""
    root = str(tmp_path / "shared")
    a = ChunkCatalog(spark, root)
    b = ChunkCatalog(spark, root, backend=a.backend.__class__(root))
    b.list_chunks()  # warm b's cache while empty
    a.register_chunk(_meta(1, 0, 10))
    assert b.list_chunks() == []  # stale by design
    b.refresh()
    assert b.list_chunks() == ["chunk01"]


def test_compaction_preserves_state(cat):
    cat.register_chunk(_meta(1, 0, 10))
    cat.register_chunk(_meta(2, 10, 20))
    cat.schedule_delete("chunk01")
    cat.backend.compact()
    assert cat.list_chunks(PENDING_DELETE) == ["chunk01"]
    assert cat.list_chunks(ACTIVE) == ["chunk02"]


def test_checkpoint_retains_recent_history(spark, tmp_path):
    """checkpoint(retain_last=K): versions inside the window stay exactly
    addressable; plain compact() degrades them (deleted chunks vanish
    from pre-delete listings)."""
    from datalake_worker_spark.catalog import ChunkCatalog, ChunkMeta

    def build(root):
        cat = ChunkCatalog(spark, str(root))
        for i in range(4):
            cat.register_chunk(
                ChunkMeta(
                    dataset_id="d",
                    chunk_id=f"c{i}",
                    block_start=i * 10,
                    block_end=(i + 1) * 10,
                    files={},
                    size_bytes=1,
                )
            )
        return cat

    cat = build(tmp_path / "a")
    v4 = cat.version
    cat.schedule_delete("c1")
    cat.vacuum()
    before = cat.list_chunks_as_of(v4)
    assert "c1" in before
    n_files_before = len(
        [f for f in (tmp_path / "a" / "_meta").iterdir() if f.suffix == ".parquet"]
    )
    cat.checkpoint(retain_last=cat.version - v4)
    # log shrank, current state intact, retained version exact
    n_files_after = len(
        [f for f in (tmp_path / "a" / "_meta").iterdir() if f.suffix == ".parquet"]
    )
    assert n_files_after < n_files_before
    assert cat.list_chunks_as_of(v4) == before
    assert "c1" not in cat.list_chunks()

    # contrast: a full fold (retain_last=0) rewrites c1's history to a
    # tombstone and the v4 listing silently loses it
    cat2 = build(tmp_path / "b")
    v4b = cat2.version
    cat2.schedule_delete("c1")
    cat2.vacuum()
    cat2.checkpoint(retain_last=0)
    assert "c1" not in cat2.list_chunks_as_of(v4b)


def test_tags_survive_autocompaction(spark, tmp_path):
    """A tag pins its version: every fold clamps below the oldest tag,
    so state_as_of_tag stays exact under unlimited auto-compaction; tags
    are immutable (re-tagging conflicts) and deletable."""
    import pytest as _pytest

    from datalake_worker_spark.errors import ChunkConflict

    root = str(tmp_path / "cat")
    cat = ChunkCatalog(spark, root)
    for i in range(5):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i}", 1000 * i, 1000 * (i + 1), {}, 10))
    assert cat.create_tag("v1") == 5
    assert cat.schedule_delete("c4")
    assert cat.vacuum() == ["c4"]
    cat.refresh()
    assert cat.create_tag("v2") == 7
    with _pytest.raises(ChunkConflict):
        cat.create_tag("v1")  # immutable
    # churn far past the auto-compaction threshold
    for i in range(5, 5 + cat.backend.AUTO_COMPACT_AT + 10):
        assert cat.register_chunk(ChunkMeta("ds", f"c{i}", 1000 * i, 1000 * (i + 1), {}, 10))
    cat.refresh()
    assert cat.list_chunks_as_of_tag("v1") == [f"c{i}" for i in range(5)]
    assert cat.list_chunks_as_of_tag("v2") == [f"c{i}" for i in range(4)]
    # deleting the oldest tag releases its pin: the next full fold may
    # degrade history before the remaining tags but keeps them exact
    assert cat.backend.delete_tag("v1")
    cat.checkpoint()
    cat.refresh()
    assert cat.list_chunks_as_of_tag("v2") == [f"c{i}" for i in range(4)]
    with _pytest.raises(KeyError):
        cat.state_as_of_tag("v1")


def test_tag_below_fold_floor_fails_loudly(cat):
    """The tag/fold handshake (ADVICE r6): after a destructive fold
    publishes its floor, tagging a seq below it must fail with a
    conflict and leave no tag behind — never a silently-inexact tag —
    while tagging at/above the floor still succeeds."""
    from datalake_worker_spark.errors import ChunkConflict

    for i in range(6):
        assert cat.register_chunk(_meta(i, 1000 * i, 1000 * (i + 1)))
    cat.checkpoint()  # full fold: floor = latest seq
    floor = cat.backend.fold_floor()
    assert floor == 6
    with pytest.raises(ChunkConflict, match="raced a compaction fold"):
        cat.backend.create_tag("stale", floor - 1)
    assert "stale" not in cat.list_tags()  # failed create left nothing
    cat.backend.create_tag("at-floor", floor)  # boundary stays exact
    assert cat.list_tags()["at-floor"] == floor
    assert cat.create_tag("head") == cat.version  # the normal path


def test_compact_aborts_deletes_for_late_tag(cat, monkeypatch):
    """A tag that lands between compact's tag snapshot and its deletes
    (simulated by injecting the create into the post-floor re-read)
    must keep every source log file — state_as_of_tag stays exact."""
    for i in range(6):
        assert cat.register_chunk(_meta(i, 1000 * i, 1000 * (i + 1)))
    backend = cat.backend
    real_list_tags = backend.list_tags
    injected = {}

    def racy_list_tags():
        tags = real_list_tags()
        if not injected:
            # first call inside compact = the pre-fold snapshot; plant
            # the racing tag so the post-floor re-read discovers it
            injected["done"] = True
            with open(os.path.join(backend.tag_dir, "late"), "w") as fh:
                import json as _json

                _json.dump({"name": "late", "seq": 3, "created_at": 0}, fh)
        return tags

    monkeypatch.setattr(backend, "list_tags", racy_list_tags)
    before = sorted(
        f for f in os.listdir(backend.meta_dir) if f.endswith(".parquet")
    )
    backend.compact()  # must abort its deletes on seeing the late tag
    after = sorted(
        f for f in os.listdir(backend.meta_dir) if f.endswith(".parquet")
    )
    assert set(before) <= set(after), "source log files were deleted"
    monkeypatch.undo()
    cat.refresh()
    assert cat.list_chunks_as_of_tag("late") == [f"chunk{i:02d}" for i in range(3)]
    # the aborted fold must NOT leave a committed floor behind (r7
    # review): history below its cutoff is intact, so tagging an old
    # seq afterwards succeeds instead of failing forever
    assert backend.fold_floor() == 0
    backend.create_tag("post-abort", 2)
    assert cat.list_tags()["post-abort"] == 2


def test_crashed_tag_writer_is_reclaimed(cat):
    """A crashed O_EXCL-fallback tag writer's empty file must not poison
    the name forever: after the grace window, create_tag reclaims it;
    inside the window it still conflicts (could be a live writer)."""
    from datalake_worker_spark.errors import ChunkConflict

    assert cat.register_chunk(_meta(0, 0, 1000))
    dead = os.path.join(cat.backend.tag_dir, "wedged")
    open(dead, "w").close()  # the crash artifact: claimed, zero bytes
    with pytest.raises(ChunkConflict):
        cat.create_tag("wedged")  # too fresh: could be live
    past = __import__("time").time() - 10
    os.utime(dead, (past, past))
    assert cat.create_tag("wedged") == cat.version  # reclaimed
    assert cat.list_tags()["wedged"] == cat.version


def test_stalled_fold_intent_survives_peer_prune(cat):
    """A fold stalled past the tagger-visibility window (30 s) but under
    the prune threshold (300 s) is IGNORED by taggers yet must NOT be
    removed by a peer fold's intent creation — the r7 advice race where
    a live fold's just-refreshed intent could be unlinked. Only a
    long-crashed intent (> INTENT_PRUNE_SECONDS) is pruned."""
    import time as _time

    assert cat.register_chunk(_meta(0, 0, 1000))
    backend = cat.backend
    intent = backend._create_fold_intent(5)
    stalled = _time.time() - 60  # stale to taggers, fresh to the pruner
    os.utime(intent, (stalled, stalled))
    backend._create_fold_intent(7)
    assert os.path.exists(intent), "stalled-but-live intent was pruned"
    crashed = _time.time() - backend.INTENT_PRUNE_SECONDS - 10
    os.utime(intent, (crashed, crashed))
    backend._create_fold_intent(9)
    assert not os.path.exists(intent), "long-crashed intent not pruned"


def test_successful_fold_prunes_lower_floors(cat):
    """Floors are per-fold files (r8); a SUCCESSFUL fold prunes the now-
    redundant lower floors after its deletes complete, so the directory
    stays bounded while fold_floor() keeps reporting the max."""
    for i in range(3):
        assert cat.register_chunk(_meta(i, 1000 * i, 1000 * (i + 1)))
    cat.checkpoint()
    first = cat.backend.fold_floor()
    assert first > 0
    for i in range(3, 6):
        assert cat.register_chunk(_meta(i, 1000 * i, 1000 * (i + 1)))
    cat.checkpoint()
    second = cat.backend.fold_floor()
    assert second > first
    floors = [
        f
        for f in os.listdir(cat.backend.meta_dir)
        if f.startswith(".floor-") and not f.startswith(".floor-intent-")
    ]
    assert len(floors) == 1, floors
    assert cat.backend._floor_cutoff(floors[0]) == second


def test_live_fold_intent_blocks_tag_transiently(cat):
    """A live fold intent (phase 1 of the handshake) must block tags
    below its cutoff — and only until it is retracted: the abort path
    removes the intent without publishing a floor, so the retry wins."""
    from datalake_worker_spark.errors import ChunkConflict

    for i in range(4):
        assert cat.register_chunk(_meta(i, 1000 * i, 1000 * (i + 1)))
    intent = cat.backend._create_fold_intent(cat.backend.frontier_seq())
    with pytest.raises(ChunkConflict, match="raced a compaction fold"):
        cat.backend.create_tag("early", 1)
    os.remove(intent)  # the fold aborted: its claim is gone
    cat.backend.create_tag("early", 1)
    assert cat.list_tags()["early"] == 1
