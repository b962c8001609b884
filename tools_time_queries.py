#!/usr/bin/env python
"""Time every registry query on a DRIVER-LIKE bare session (no custom
confs, default shuffle partitions) at sf0.01 — finds what eats the
driver's CORRECTNESS budget. Not part of the engine; a tuning tool."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datalake_worker_spark import registry

    qs = registry.queries()
    timings = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 2)
            print(f"{name:35s} {dt:7.2f}s  {len(rows)} rows", flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 2)
            print(f"{name:35s} {dt:7.2f}s  ERR {type(e).__name__}: {e}", flush=True)
    total = round(sum(timings.values()), 2)
    print(f"TOTAL {total}s over {len(timings)} queries")
    with open("timings_driver_sim.json", "w") as f:
        json.dump({"total": total, "queries": timings}, f, indent=1)


if __name__ == "__main__":
    main()
