#!/usr/bin/env python
"""Driver-contract verification: fresh driver-like bare session, every
oracle-backed query compared to DuckDB at sf0.01 (cols, rows, value
hash); rows-only queries just executed."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from datalake_worker_spark.canonical import duckdb_result, result_hash, spark_result
from datalake_worker_spark.session import release_cached_state


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("verify-driver")
        .config("spark.ui.showConsoleProgress", "false")
        # hand-built sessions default to a 1 g driver heap — enough for
        # the sf0.01 contract scale but the silent cause of OOMs when
        # this tool sweeps the 10x corpus (SPARK_GRAFT_DRIVER_MEM was
        # read by get_spark, not by this builder)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = E.entry(spark)
    n = len(df.collect())
    print(f"entry(): {n} rows", flush=True)
    assert n > 0

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        pat = f"{sf}/{t}.parquet"
        if os.path.isdir(pat):  # Spark-written multi-file table (10x corpus)
            pat += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

    bad = []
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            cols, rows = spark_result(fn(spark, sf))
            # driver hazard: array/map cells crash its canonicalizer
            for r in rows[:1]:
                for v in r:
                    assert not isinstance(v, (list, dict)), f"non-scalar cell in {name}: {type(v)}"
            if name in osql:
                ocols, orows = duckdb_result(con, osql[name])
                ok = (
                    sorted(cols) == sorted(ocols)
                    and len(rows) == len(orows)
                    and result_hash(cols, rows) == result_hash(ocols, orows)
                )
                status = "OK" if ok else "HASH-MISMATCH"
                if not ok:
                    bad.append(name)
                    if sorted(cols) != sorted(ocols):
                        status += f" cols {sorted(cols)} vs {sorted(ocols)}"
                    elif len(rows) != len(orows):
                        status += f" rows {len(rows)} vs {len(orows)}"
            else:
                status = f"rows-only ({len(rows)})"
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            status = f"ERR {type(e).__name__}: {str(e)[:200]}"
        dt = time.perf_counter() - t0
        flag = "" if name not in bad else "  <<<<"
        print(f"{name:35s} {dt:6.2f}s  {status}{flag}", flush=True)
        # long-session hygiene: each result is fully consumed above, so
        # lingering persisted/checkpoint blocks are dead weight — without
        # this the full sweep at the 10x corpus OOMed a 64 g heap
        release_cached_state(spark)
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s  failures: {bad}")
    # graceful teardown: a bare sys.exit drops the JVM mid-async-unpersist
    # and the block-removal future logs an ERROR stack into every captured
    # log tail (cosmetic, but it buries the failures line). Stop the
    # context first so removals drain.
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
