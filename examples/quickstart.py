#!/usr/bin/env python
"""Quickstart: the engine's three surfaces in one script.

  python examples/quickstart.py [sf_dir]

1. lake core     — register chunks, containment find, pinned read, vacuum
2. relational    — DataFrame/SQL queries over the registered data
3. LLM pipeline  — dedup + similarity over documents/embeddings
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_worker_spark.catalog import ChunkCatalog, ChunkMeta
from datalake_worker_spark.functions.dedup import near_dup_pairs_minhash
from datalake_worker_spark.functions.similarity import exact_topk, to_double_array
from datalake_worker_spark.session import get_spark
from datalake_worker_spark.sources import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart", cpus="8")

    # -- 1. lake core ------------------------------------------------------
    cat = ChunkCatalog(spark, tempfile.mkdtemp(prefix="qs_"))
    cat.register_chunk(
        ChunkMeta(
            "tpch", "lineitem-0", 0, 1000,
            {"lineitem.parquet": os.path.join(sf_dir, "lineitem.parquet")},
            size_bytes=1,
        )
    )
    print("chunks:", cat.list_chunks())
    with cat.pin("tpch", 500) as ref:
        li = spark.read.parquet(ref.path())
        print("pinned scan rows:", li.count())
    cat.schedule_delete("lineitem-0")
    print("vacuumed:", cat.vacuum())

    # -- 2. relational -----------------------------------------------------
    li = load_table(spark, sf_dir, "lineitem")
    q1 = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )
    q1.show()

    # -- 3. LLM pipeline ---------------------------------------------------
    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    print("near-dup pairs:", pairs.count())
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    topk = exact_topk(emb, emb.filter(F.col("vec_id") < 3), "vec_id", "v", k=3)
    topk.show()


if __name__ == "__main__":
    main()
