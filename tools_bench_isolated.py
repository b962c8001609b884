#!/usr/bin/env python
"""Isolated re-measurement of a named query list (VERDICT r6 item 2).

Runs the given queries FIRST in a fresh SparkSession (no prior suites
polluting JVM/page cache), 1 warm-up + median of N runs, and prints one
JSON line.  Usage:

    python tools_bench_isolated.py q07_volume_shipping q13_... [--runs 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    argv = sys.argv[1:]
    args, runs = [], 5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a == "--runs":
            i += 1
            if i >= len(argv):
                sys.exit("usage: --runs N")
            runs = int(argv[i])
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name="dlw-bench-isolated",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
        ),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = registry.queries()
    out: dict[str, float] = {}
    for name in args:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm-up: codegen + file listing
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 4)
    print(json.dumps({"isolated": out, "runs": runs, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
