#!/usr/bin/env python
"""10x sanity probe for the round-13-optimization-touched operators.

Builds (or reuses) the tools_scale_probe 10x corpus and times each
touched query at sf0.1 and at 10x (median of 3, fresh session), so the
spread_scan/persist changes are shown NOT to regress the scale shape
(spread_scan must be a no-op on the multi-partition 10x corpus).
Appends the result to scale_probe.json under "r13_touched_10x".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools_scale_probe import SF_BIG, SF_SRC, build_big  # noqa: E402

TOUCHED = [
    "v13_kmeans_clusters",
    "v15_ivf_audit",
    "v16_ivfpq_audit",
    "d24_semdedup_audit",
    "d04_minhash_near_dups",
    "d07_ssjoin_prefix",
    "q26_nation_pagerank",
    "t21_textrank_keywords",
    "v09_ann_ivfpq_topk",
    "v14_lsh_candidate_audit",
    "m06_perceptual_near_dup",
    "m09_phash_audit",
    "d15_duplicate_spans",
    "d20_simhash_audit",
    "q23_copurchase_lift",
    "d23_keeplist_audit",
    "t31_quality_logreg",
    "v10_matryoshka_audit",
]


def _time(spark, qs, sf_dir, names, runs=3):
    out = {}
    for n in names:
        fn = qs[n]
        fn(spark, sf_dir).count()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(samples), 3)
    return out


def main() -> None:
    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name="dlw-touched-10x",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        ),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_big(spark)
    qs = registry.queries()
    small = _time(spark, qs, SF_SRC, TOUCHED)
    big = _time(spark, qs, SF_BIG, TOUCHED)
    report = {
        n: {
            "small_s": small[n],
            "big_s": big[n],
            "ratio": round(big[n] / small[n], 2) if small[n] else None,
        }
        for n in TOUCHED
    }
    path = "scale_probe.json"
    full = json.load(open(path)) if os.path.exists(path) else {}
    full["r13_touched_10x"] = report
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps({n: r["ratio"] for n, r in report.items()}))


if __name__ == "__main__":
    main()
