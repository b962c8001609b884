#!/usr/bin/env python
"""End-to-end vector lake: the embedding-side operators chained the way
a retrieval/dedup stack composes them.

  python examples/vector_pipeline.py [sf_dir]

  embeddings
    │ 1. streaming index   (st14 shape: frozen coarse quantizer, two
    │                       micro-batches assigned map-side into a
    │                       cell-partitioned index)
    │ 2. stats audit       (v03 norms/moments — catch degenerate vectors)
    │ 3. quantization audit(v05 int8 scale/RMSE — is 4x compression safe?)
    │ 4. PQ audit          (v08 codebook RMSE — is 32x compression safe?)
    │ 5. ANN search        (v09 IVF+PQ with ADC + exact refine)
    └─ 6. semantic dedup   (d11: near-identical vectors collapse)

Every stage is deterministic (sha-ranked inits, DECIMAL-summed model
updates) — the same corpus yields bit-identical centroids, codes, and
survivors on any cluster layout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_worker_spark.session import get_spark
from datalake_worker_spark.sources.readers import load_table
from datalake_worker_spark.functions.similarity import (
    ann_topk_ivfpq,
    to_double_array,
)
from datalake_worker_spark.streaming.vecindex import run_streaming_vector_index
from datalake_worker_spark import registry

registry._load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vector-pipeline", cpus="8", shuffle_partitions=8)
    t0 = time.time()
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    n = e.count()
    print(f"embeddings        {n:>6}")

    # 1. streaming index: two arrival epochs, frozen quantizer
    probes = e.filter(F.col("vec_id") < 10)
    hits = run_streaming_vector_index(
        spark,
        [e.filter(F.col("vec_id") % 2 == 0), e.filter(F.col("vec_id") % 2 == 1)],
        probes,
        k=5,
        n_clusters=8,
        nprobe=5,
        dim=64,
    )
    print(f"index hits        {hits.count():>6}  (streaming, cell-pruned probe)")

    # 2-4. audits: vector stats, int8 RMSE, PQ RMSE
    stats = registry.REGISTRY["v03_embedding_stats"].spark_fn(spark, sf_dir)
    print(f"stats rows        {stats.count():>6}")
    q8 = registry.REGISTRY["v05_embedding_quantize"].spark_fn(spark, sf_dir)
    worst8 = q8.agg(F.max("rmse")).first()[0]
    print(f"int8 worst RMSE   {worst8:>9.4f}")
    pq = registry.REGISTRY["v08_pq_quantization_audit"].spark_fn(spark, sf_dir)
    worst_pq = pq.agg(F.max("rmse")).first()[0]
    print(f"PQ worst RMSE     {worst_pq:>9.4f}")

    # 5. IVF+PQ search with ADC + refine
    ann = ann_topk_ivfpq(
        e, probes, "vec_id", "v", k=5, n_clusters=8, nprobe=5, dim=64,
        n_codes=32, refine=96,
    )
    print(f"ivfpq hits        {ann.count():>6}")

    # 6. semantic dedup survivors
    sd = registry.REGISTRY["d11_semantic_dedup"].spark_fn(spark, sf_dir)
    print(f"semantic survivors{sd.count():>6}")

    # 7. multi-probe LSH recall + matryoshka truncation audit (r7)
    lsh = registry.REGISTRY["v02_ann_lsh_topk"].spark_fn(spark, sf_dir)
    print(f"lsh hits          {lsh.count():>6}  (Hamming-1 multi-probe)")
    mat = registry.REGISTRY["v10_matryoshka_audit"].spark_fn(spark, sf_dir)
    kept = mat.agg(F.avg("preserved_at_5")).first()[0]
    print(f"top-5 kept @16dim {kept:>9.2f}  of 5 (truncation audit)")
    print(f"wall              {time.time() - t0:>8.1f}s")


if __name__ == "__main__":
    main()
