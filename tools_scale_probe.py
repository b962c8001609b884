#!/usr/bin/env python
"""Scale-up probe: run representative operators at sf0.1 and at a
10x-replicated copy (~sf1) and record the wall-clock ratio per query.

The replication shifts primary keys per copy (orderkey/doc_id/event_id/
vec_id) while leaving dimension FKs intact, so joins stay valid and
per-key cardinalities grow the way a bigger corpus would. documents
text is replicated verbatim — dedup operators therefore see 10x exact
duplicates, which is exactly the hot-page skew the mass-dup guards are
designed for.

A query whose ratio is ~10x scales linearly (shuffle/agg bound); well
under 10x means fixed overhead dominated the small run; well over 10x
is a super-linear red flag (pair explosion, driver loop). Results land
in scale_probe.json and are summarized in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_BIG = os.environ.get("SPARK_GRAFT_SFX_DIR", "/tmp/dlw_sfx1")
COPIES = 10

# key column to shift per fact table; dims replicate once
FACT_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

PROBE = [
    "q01_pricing_summary",       # scan + wide agg
    "q03_shipping_priority",     # 3-way join + agg + topk
    "q18_large_volume_customer", # join + having subquery
    "a03_count_distinct_having", # distinct agg
    "w06_sessionization",        # window over events
    "x02_asof_event_order",      # as-of join
    "d01_exact_dedup_keep_first",# hash dedup (now 10x dups)
    "d04_minhash_near_dups",     # LSH near-dup (10x exact dups planted)
    "t01_token_stats",           # text scan
    "smp03_exact_percentiles",   # sort-based percentiles
    "v01_exact_cosine_topk",     # brute-force ANN baseline
    "w13_time_weighted_average", # lead-window + agg, one shuffle
    "w14_ohlc_bars",             # windowed endpoints + bar agg
    "d16_char_jaccard_pairs",    # blocked pair join (CJK dedup path)
    "smp10_dsir_importance",     # distributed exact rank selection
]


def build_big(spark) -> None:
    from pyspark.sql import functions as F
    from datalake_worker_spark.sources.readers import load_table

    os.makedirs(SF_BIG, exist_ok=True)
    for t in DIMS:
        dst = os.path.join(SF_BIG, f"{t}.parquet")
        if not os.path.exists(dst):
            load_table(spark, SF_SRC, t).write.mode("overwrite").parquet(dst)
    for t, key in FACT_KEYS.items():
        dst = os.path.join(SF_BIG, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, SF_SRC, t)
        shift = (base.agg(F.max(key)).first()[0] or 0) + 1
        copies = [
            base.withColumn(key, (F.col(key) + F.lit(int(i * shift))).cast("long"))
            for i in range(COPIES)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"built {t}: {COPIES}x", flush=True)


def time_queries(spark, qs, sf_dir, names, runs=3) -> dict[str, float]:
    out = {}
    for n in names:
        qs[n](spark, sf_dir).count()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(samples), 3)
        print(f"{sf_dir.split('/')[-1]:>10} {n:32s} {out[n]:7.3f}s", flush=True)
    return out


def main() -> None:
    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name="dlw-scale-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    build_big(spark)
    qs = registry.queries()
    small = time_queries(spark, qs, SF_SRC, PROBE)
    big = time_queries(spark, qs, SF_BIG, PROBE)
    report = {
        "copies": COPIES,
        "small_dir": SF_SRC,
        "big_dir": SF_BIG,
        "queries": {
            n: {
                "small_s": small[n],
                "big_s": big[n],
                "ratio": round(big[n] / small[n], 2) if small[n] else None,
            }
            for n in PROBE
        },
    }
    with open("scale_probe.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({n: r["ratio"] for n, r in report["queries"].items()}))


if __name__ == "__main__":
    main()
