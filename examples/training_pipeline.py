#!/usr/bin/env python
"""Model-assisted curation: the round-10 TRAINING operators chained the
way a modern pre-training data run uses learned components end to end.

  python examples/training_pipeline.py [sf_dir]

  documents ──────────────┐
    │ 1. repetition filter (t32 Gopher rules: top-n-gram / dup-5-gram)
    │ 2. substring dedup   (d18 spans: drop docs >50% corpus-duplicated)
    │ 3. learned quality   (t31 logistic GD trained ON this corpus,
    │                       keep p_quality >= 0.5)
    │ 4. BPE token budget  (t30 merges trained on the corpus;
    │                       per-lang subword counts, not whitespace
    │                       proxies)
  embeddings ─────────────┤
    │ 5. k-means domains   (v13 relational Lloyd's: cluster ids as
    │                       mixture domains for the sampler)
    └─ 6. per-cluster budget report (tokens per learned domain)

Every model is trained relationally inside the engine (no driver-side
fit beyond literal re-entry of bounded state), and every stage is
deterministic — same corpus, same merges, same weights, same clusters
on any partitioning.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training-pipeline", shuffle_partitions=16)
    _load_all()
    q = {n: REGISTRY[n].spark_fn for n in REGISTRY}

    # 1-2: rule-based gates
    rep = q["t32_repetition_filter"](spark, sf)
    spans = q["d18_substring_dedup_spans"](spark, sf)
    gated = (
        rep.filter(F.col("keep") == 1)
        .select("doc_id")
        .join(spans.filter(F.col("dup_frac") <= 0.5).select("doc_id"), "doc_id")
    )
    n_gated = gated.count()

    # 3: learned quality gate (trained on the full corpus, applied to
    # the gate survivors)
    quality = q["t31_quality_logreg"](spark, sf)
    kept = gated.join(
        quality.filter(F.col("p_quality") >= 0.5).select("doc_id"), "doc_id"
    )
    n_kept = kept.count()

    # 4: corpus subword budget per language (t30's trained BPE merges;
    # t30 reports per-lang totals, the budget denominator a sampler
    # scales against the kept-set share)
    toks = q["t30_bpe_subword_tokens"](spark, sf)
    budget = {r.lang: r.n_tokens for r in toks.collect()}

    # 5-6: learned domains over the embedding space
    clusters = q["v13_kmeans_clusters"](spark, sf)
    report = (
        clusters.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
        .collect()
    )

    print(f"rule-gated docs:      {n_gated}")
    print(f"quality-kept docs:    {n_kept}")
    print(f"subword budget/lang:  {budget}")
    for r in report:
        print(f"domain {r.cluster}: {r.n_vectors} vectors")


if __name__ == "__main__":
    main()
