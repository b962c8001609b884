"""Engine CLI — parity with the reference's REPL commands
(/root/reference/src/bin/main.rs:7-12: List / FindWithLock /
ScheduledDelete / Exit) plus the engine-native additions: `query`,
`vacuum`, `total-size`, `ingest`.

Usage:
  python -m datalake_worker_spark.cli --root /path/to/catalog COMMAND [...]

Commands:
  list-chunks                         (R3, main.rs:66-79)
  find DATASET BLOCK [--pin]         (R4 FindWithLock, main.rs:80-97;
                                      containment semantics, divergence D1)
  schedule-delete CHUNK_ID           (R7 ScheduledDelete, main.rs:98-110)
  vacuum                             (the deferred-delete barrier)
  total-size                         (R11)
  register DATASET CHUNK_ID START END PATH [--size N]
  query SQL                          (engine-native: Spark SQL over
                                      registered temp views of chunk data)
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="datalake-worker-spark")
    p.add_argument("--root", required=True, help="catalog root directory")
    p.add_argument("--master", default="local[*]")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-chunks")
    f = sub.add_parser("find")
    f.add_argument("dataset")
    f.add_argument("block", type=int)
    f.add_argument("--pin", action="store_true", help="hold a lease and print its id")
    d = sub.add_parser("schedule-delete")
    d.add_argument("chunk_id")
    rl = sub.add_parser("release-lease")
    rl.add_argument("lease_id")
    sub.add_parser("vacuum")
    sub.add_parser("total-size")
    r = sub.add_parser("register")
    r.add_argument("dataset")
    r.add_argument("chunk_id")
    r.add_argument("start", type=int)
    r.add_argument("end", type=int)
    r.add_argument("path")
    r.add_argument("--size", type=int, default=0)
    q = sub.add_parser("query")
    q.add_argument("sql")
    ing = sub.add_parser("ingest")
    ing.add_argument("landing_dir", help="directory of incoming parquet files")
    ing.add_argument("dataset")
    ing.add_argument("block_col")
    ing.add_argument("--blocks-per-chunk", type=int, default=1000)
    t = sub.add_parser("tag", help="tag the current catalog version (immutable)")
    t.add_argument("name")
    sub.add_parser("tags", help="list tags as JSON {name: version}")
    lt = sub.add_parser(
        "list-chunks-at", help="active chunks as of a tag or numeric version"
    )
    lt.add_argument("ref", help="tag name or integer version")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .catalog import ChunkCatalog, ChunkMeta
    from .session import get_spark

    spark = get_spark(app_name="dlw-cli", master=args.master)
    cat = ChunkCatalog(spark, args.root)

    if args.cmd == "list-chunks":
        for cid in cat.list_chunks():
            print(cid)
    elif args.cmd == "find":
        if args.pin:
            ref = cat.find_chunk(args.dataset, args.block)
            if ref is None:
                print("not found")
                return 1
            print(json.dumps({"chunk_id": ref.meta.chunk_id, "path": ref.path(), "lease_id": ref.lease_id}))
        else:
            meta = cat.find_chunk_meta(args.dataset, args.block)
            if meta is None:
                print("not found")
                return 1
            print(json.dumps({"chunk_id": meta.chunk_id, "block_start": meta.block_start, "block_end": meta.block_end}))
    elif args.cmd == "release-lease":
        cat.backend.remove_lease(args.lease_id)
        print("released")
    elif args.cmd == "schedule-delete":
        ok = cat.schedule_delete(args.chunk_id)
        print("scheduled" if ok else "not active / unknown chunk")
        return 0 if ok else 1
    elif args.cmd == "vacuum":
        removed = cat.vacuum()
        print(json.dumps({"removed": removed}))
    elif args.cmd == "total-size":
        print(cat.total_size())
    elif args.cmd == "register":
        ok = cat.register_chunk(
            ChunkMeta(args.dataset, args.chunk_id, args.start, args.end, {"data": args.path}, args.size)
        )
        print("registered" if ok else "already present")
    elif args.cmd == "tag":
        try:
            seq = cat.create_tag(args.name)
        except Exception as exc:  # noqa: BLE001 — conflict: tag exists
            print(str(exc))
            return 1
        print(json.dumps({"tag": args.name, "version": seq}))
    elif args.cmd == "tags":
        print(json.dumps(cat.list_tags(), sort_keys=True))
    elif args.cmd == "list-chunks-at":
        if args.ref.isdigit():
            cids = cat.list_chunks_as_of(int(args.ref))
        else:
            try:
                cids = cat.list_chunks_as_of_tag(args.ref)
            except KeyError:
                print(f"unknown tag {args.ref!r}")
                return 1
        for cid in cids:
            print(cid)
    elif args.cmd == "ingest":
        # streaming ingest of a landing directory (R1/R2: the reference's
        # parallel S3 download loop as Structured Streaming)
        from .streaming.ingest import ingest_stream

        schema = spark.read.parquet(args.landing_dir).schema
        q = ingest_stream(
            spark,
            cat,
            args.landing_dir,
            schema,
            dataset_id=args.dataset,
            block_col=args.block_col,
            blocks_per_chunk=args.blocks_per_chunk,
        )
        q.awaitTermination()
        print(json.dumps({"chunks": cat.list_chunks()}))
    elif args.cmd == "query":
        # expose every ACTIVE chunk as a temp view "<dataset>_<start>" and
        # run the SQL; results stream to stdout as JSON lines. Chunks
        # sharing (dataset, block_start) — e.g. one block bucket filled
        # across several ingest epochs — get _2/_3 suffixes instead of
        # silently shadowing each other; names are sanitized to SQL ids.
        import re as _re

        taken: set[str] = set()
        rows = sorted(
            cat.chunks_df().filter("state = 'ACTIVE'").collect(),
            key=lambda r: (r["dataset_id"], r["block_start"], r["chunk_id"]),
        )
        for r in rows:
            files = json.loads(r["files"])
            meta = ChunkMeta(r["dataset_id"], r["chunk_id"], r["block_start"], r["block_end"], files, r["size_bytes"])
            base = _re.sub(r"[^A-Za-z0-9_]", "_", f"{r['dataset_id']}_{r['block_start']}")
            view, k = base, 1
            while view in taken:
                k += 1
                view = f"{base}_{k}"
            taken.add(view)
            spark.read.parquet(cat.chunk_path(meta)).createOrReplaceTempView(view)
        for row in spark.sql(args.sql).toJSON().toLocalIterator():
            print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
