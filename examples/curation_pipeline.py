#!/usr/bin/env python
"""End-to-end corpus curation: the LLM-pipeline endpoints chained the way
a real pre-training data run composes them.

  python examples/curation_pipeline.py [sf_dir]

  documents
    │ 1. quality filter      (t17 rule stack: keep/drop + reasons)
    │ 2. URL canonical dedup (d12: keep min doc_id per canonical URL)
    │ 3. exact text dedup    (sha2 keep-first)
    │ 4. decontamination     (d14 bloom gate vs a held-out benchmark set)
    │ 5. DSIR selection      (smp10 importance weights, top 75% kept)
    │ 6. domain mixture      (smp08 acceptance rates per source)
    │ 7. weighted sample     (smp07 Efraimidis-Spirakis by n_chars)
    │ 8. content fingerprint (a13-style commutative digest of the output)
    └─ 9. RAG chunking       (t18 sliding windows of the final corpus)

Every stage is deterministic (keyed hashes, never rand()), so the same
input yields the same corpus — and the same fingerprint — on any cluster
layout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_worker_spark.functions.dedup import _RAW_URL_SQL, canonicalize_url
from datalake_worker_spark.session import get_spark
from datalake_worker_spark.sources import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation", cpus="8")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality filter (inline t17 signals on the fly)
    tf = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    sig = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        (F.max("c") / F.sum("c")).alias("top_frac"),
    )
    keep_ids = sig.filter((F.col("n_tok") >= 20) & (F.col("top_frac") <= 0.2))
    docs = docs.join(keep_ids.select("doc_id"), "doc_id", "left_semi")
    n1 = docs.count()

    # 2. URL canonicalization dedup (synthesized URLs, as in d12)
    with_url = docs.withColumn(
        "canonical_url", canonicalize_url(F.expr(_RAW_URL_SQL))
    )
    w = W.partitionBy("canonical_url").orderBy("doc_id")
    docs = (
        with_url.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "canonical_url")
    )
    n2 = docs.count()

    # 3. exact text dedup, keep-first
    w = W.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    docs = docs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
    n3 = docs.count()

    # 4. decontamination: bloom gate against a held-out benchmark slice
    from datalake_worker_spark.functions.pipeline import bloom_decontaminate

    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    flagged = bloom_decontaminate(docs, bench, "doc_id", "text", n=5)
    docs = docs.join(flagged.select("doc_id"), "doc_id", "left_anti")
    n3b = docs.count()

    # 5. DSIR importance selection (smp10's construction inline): keep
    # the 75% most target-like documents
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    tgt = bench.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    tc = tgt.groupBy("tok").agg(F.count("*").alias("c_t"))
    cc = tok.groupBy("tok").agg(F.count("*").alias("c_c"))
    vocab = tc.join(cc, "tok", "full_outer").select(
        "tok",
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
        F.coalesce("c_c", F.lit(0)).alias("c_c"),
    )
    tot = vocab.agg(
        F.sum("c_t").cast("double").alias("n_t"),
        F.sum("c_c").cast("double").alias("n_c"),
        F.count("*").cast("double").alias("v"),
    )
    lw = F.round(
        F.log((F.col("c_t") + 1) / (F.col("n_t") + F.col("v")))
        - F.log((F.col("c_c") + 1) / (F.col("n_c") + F.col("v"))),
        6,
    ).cast("decimal(18,6)")
    weights = (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lw.alias("lw"))
        .groupBy("doc_id")
        .agg(F.sum("lw").cast("double").alias("log_weight"))
    )
    from datalake_worker_spark.operators.windows import distributed_percent_rank

    kept = (
        distributed_percent_rank(
            weights,
            [F.col("log_weight").desc(), F.col("doc_id").asc()],
            out_col="_pr",
        )
        .filter(F.col("_pr") <= 0.75)
        .select("doc_id")
    )
    docs = docs.join(kept, "doc_id", "left_semi")
    n3c = docs.count()

    # 6. domain mixture acceptance (smp08 rates)
    u01 = "((((doc_id % 4294967296) * 2654435761) % 4294967296) + 0.5) / 4294967296.0"
    rate = (
        F.when(F.col("source").isin("src0", "src1"), 1.0)
        .when(F.col("source").isin("src2", "src3"), 0.5)
        .otherwise(0.25)
    )
    docs = docs.filter(F.expr(u01) < rate)
    n4 = docs.count()

    # 7. weighted sample (heavier docs proportionally likelier), top 50
    pri = F.expr(f"-ln({u01}) / n_chars")
    sample = docs.orderBy(pri, "doc_id").limit(50)
    n5 = sample.count()

    # 8. order-independent fingerprint of the final corpus
    canon = F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))
    v = F.conv(F.substring(F.sha2(canon, 256), 1, 10), 16, 10).cast("long")
    fp = sample.select(v.alias("v")).agg(F.sum("v").cast("long")).first()[0]

    # 9. RAG chunking of the final sample
    from datalake_worker_spark.functions.pipeline import chunk_documents

    n6 = chunk_documents(sample, "doc_id", "text").count()

    print(f"input            {n0:>6}")
    print(f"quality filter   {n1:>6}")
    print(f"url dedup        {n2:>6}")
    print(f"exact dedup      {n3:>6}")
    print(f"decontaminated   {n3b:>6}")
    print(f"dsir selected    {n3c:>6}")
    print(f"mixture          {n4:>6}")
    print(f"weighted sample  {n5:>6}")
    print(f"rag chunks       {n6:>6}")
    print(f"fingerprint      {fp}")


if __name__ == "__main__":
    main()
