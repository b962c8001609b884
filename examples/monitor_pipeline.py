#!/usr/bin/env python
"""Corpus health monitoring: the sketch/statistics family chained the
way a production ingest pipeline watches its own data.

  python examples/monitor_pipeline.py [sf_dir]

  documents / lineitem / events
    │ 1. quantile gates   (a17 DDSketch: p50/p90/p99 of value columns —
    │                      mergeable counters, so daily sketches roll up
    │                      into weekly ones by addition)
    │ 2. heavy hitters    (st20 SpaceSaving over streamed batches:
    │                      which tokens dominate the feed, with a
    │                      provable est-true <= floor error bar)
    │ 3. point queries    (a16 CMS: is THIS token's frequency sane?)
    │ 4. distinct scale   (a11 HLL: vocabulary growth per rollup)
    │ 5. drift            (st18 PSI per day vs the first day)
    └─ 6. storage audit   (m08 CDC chunk manifest: what dedup ratio
                           would the chunk store achieve?)

Each stage is a bounded-state summary: counters, m counters + floor,
depth x width cells, HLL registers, per-day histograms, chunk shas.
Nothing scales with corpus size except the one wide stage each sketch
is built from — the monitoring cost at 100 TB is the cost of reading
the data once.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_worker_spark import registry
from datalake_worker_spark.session import get_spark

registry._load_all()
from datalake_worker_spark.registry import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="monitor-pipeline", cpus="8", shuffle_partitions=8)
    t0 = time.time()

    def run(name: str, show: int = 3):
        rows = REGISTRY[name].spark_fn(spark, sf_dir).collect()
        print(f"{name:32s} {len(rows):>5} rows   e.g. {rows[:show]}")
        return rows

    # 1. quantile gates — alert if p99 drifts out of band
    q = run("a17_ddsketch_quantiles")
    for r in q:
        assert r.p50 <= r.p90 <= r.p99, "quantile monotonicity"
    # 2. heavy hitters with error bars
    hh = run("st20_spacesaving_topk")
    # 3. CMS point-query audit of the same feed
    run("a16_cms_heavy_hitters")
    # 4. distinct-scale rollup (mergeable HLL)
    run("a11_hll_distinct_rollup")
    # 5. drift per ingest day
    run("st18_streaming_drift_psi")
    # 6. what would the chunk store save?
    m = run("m08_cdc_chunking")
    ratio = max(r.dedup_ratio for r in m)
    print(f"\nbest CDC dedup ratio: {ratio}; top token: {hh[0].tok} "
          f"(est {hh[0].est}, error <= {hh[0].floor})")
    print(f"done in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
