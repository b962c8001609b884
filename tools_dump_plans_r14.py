#!/usr/bin/env python
"""Dump .explain('formatted') for the round-13-touched queries into
plans/r14/<query>_<tag>.txt (tag = before|after).

'before' runs against a pristine checkout of the round-entry commit
(pass its path via --repo), 'after' against this repo. The judge checks
plan-shape claims in OPTIMIZATION_r14.md against these files.

    python tools_dump_plans_r14.py after
    python tools_dump_plans_r14.py before --repo /tmp/repo_before
"""

from __future__ import annotations

import os
import sys

TOUCHED = [
    # k-means/PQ assignment+update fusion (wave11/wave14)
    "v13_kmeans_clusters",
    "v15_ivf_audit",
    "v16_ivfpq_audit",
    "d24_semdedup_audit",
    # connected-components round restructure (graph.py)
    "d10_duplicate_clusters",
    "d23_keeplist_audit",
    # one-pass symmetrization / collect folds
    "q29_kcore",
    "q26_nation_pagerank",
    "t21_textrank_keywords",
    # d07 prefix-index restructure (setsim.py)
    "d07_ssjoin_prefix",
    # a15 narrowed window shuffle (wave7.py)
    "a15_weighted_median",
    # driver-side fixpoints over the nation-keyed graph (this session)
    "q27_label_propagation",
    "q28_sssp_bellman_ford",
    # t31 spread revert / v10 spread keep (clean A/Bs)
    "t31_quality_logreg",
    "v10_matryoshka_audit",
    # d04 shared-input persist
    "d04_minhash_near_dups",
]

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")


def main() -> None:
    tag = sys.argv[1]
    repo = os.path.dirname(os.path.abspath(__file__))
    for i, a in enumerate(sys.argv):
        if a == "--repo":
            repo = sys.argv[i + 1]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name=f"dlw-plans-{tag}",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
        ),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TOUCHED:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not registered in {repo}")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"(failed to build plan: {exc})"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(
                f"-- {name} [{tag}] explain('formatted') at sf0.1, "
                f"local[32], shuffle_partitions=16\n"
            )
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
