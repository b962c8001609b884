"""Prefix-filtered ssjoin: must find EXACTLY the same pairs as the
brute-force all-pairs Jaccard (it's an exact algorithm, not approximate)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datalake_worker_spark.functions.dedup import exact_jaccard
from datalake_worker_spark.functions.setsim import jaccard_pairs_prefix


def _docs(spark, n=80, seed=3):
    rng = random.Random(seed)
    vocab = [f"g{i}" for i in range(150)]
    rows = []
    for i in range(n):
        base = rng.sample(vocab, rng.randint(8, 25))
        rows.append((i, base))
        if rng.random() < 0.4:  # planted near-dup
            dup = list(base)
            for _ in range(rng.randint(1, 3)):
                dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((n + i, sorted(set(dup))))
    return spark.createDataFrame(rows, "id long, g array<string>")


def _brute(spark, docs, t):
    a = docs.select(F.col("id").alias("ia"), F.col("g").alias("ga"))
    b = docs.select(F.col("id").alias("ib"), F.col("g").alias("gb"))
    jac = exact_jaccard(F.col("ga"), F.col("gb"))
    return {
        (r.ia, r.ib, r.j)
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .withColumn("j", F.round(jac, 6))
        .filter(F.col("j") >= t)
        .collect()
    }


def test_prefix_join_equals_bruteforce(spark):
    docs = _docs(spark)
    for t in (0.5, 0.7, 0.9):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in jaccard_pairs_prefix(docs, "id", "g", t).collect()
        }
        want = _brute(spark, docs, t)
        assert got == want, (t, got ^ want)


def test_prefix_join_identical_sets(spark):
    docs = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "b", "c"]), (3, ["x", "y"])],
        "id long, g array<string>",
    )
    got = jaccard_pairs_prefix(docs, "id", "g", 0.99).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]
