"""Statistical / property-based tests (hypothesis for pure-Python
pieces; seeded statistics for the Spark-side sketches)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datalake_worker_spark.canonical import result_hash

cell = st.one_of(
    st.none(),
    st.integers(-(2**40), 2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
    st.booleans(),
)


@given(
    st.lists(st.tuples(cell, cell, cell), min_size=0, max_size=20),
    st.permutations([0, 1, 2]),
)
@settings(max_examples=200, deadline=None)
def test_hash_invariant_under_row_and_column_permutation(rows, perm):
    cols = ["a", "b", "c"]
    h1 = result_hash(cols, rows)
    shuffled = list(rows)
    random.Random(0).shuffle(shuffled)
    permuted_cols = [cols[i] for i in perm]
    permuted_rows = [tuple(r[i] for i in perm) for r in shuffled]
    assert result_hash(permuted_cols, permuted_rows) == h1


@given(st.lists(st.tuples(cell), min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_hash_sensitive_to_extra_row(rows):
    h1 = result_hash(["x"], rows)
    h2 = result_hash(["x"], rows + [("sentinel-not-in-rows",)])
    assert h1 != h2


def test_minhash_signature_estimates_jaccard(spark):
    """Statistical: fraction of agreeing signature components ≈ true
    Jaccard (within ±0.15 at k=64) across pairs of varying overlap."""
    from datalake_worker_spark.functions.dedup import minhash_signatures

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(400)]
    docs, truths = [], {}
    pair_id = 0
    for overlap in (0.2, 0.5, 0.8):
        for _ in range(4):
            base = rng.sample(vocab, 120)
            n_keep = int(len(base) * overlap)
            other = base[:n_keep] + rng.sample(
                [w for w in vocab if w not in base], len(base) - n_keep
            )
            a_id, b_id = 2 * pair_id, 2 * pair_id + 1
            docs.append((a_id, " ".join(base)))
            docs.append((b_id, " ".join(other)))
            truths[(a_id, b_id)] = None  # filled from exact shingle jaccard
            pair_id += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # ground truth on the SAME shingle definition the signatures use
    from datalake_worker_spark.functions.dedup import shingles_from_words

    sh = df.select(
        "doc_id",
        F.array_distinct(
            shingles_from_words(F.split(F.col("text"), " "))
        ).alias("s"),
    ).collect()
    shingle_sets = {r.doc_id: set(r.s) for r in sh}

    sigs = minhash_signatures(df, "doc_id", "text", 64).collect()
    sig = {r.doc_id: [r[f"h{i}"] for i in range(64)] for r in sigs}
    errs = []
    for a, b in truths:
        sa, sb = shingle_sets[a], shingle_sets[b]
        true_j = len(sa & sb) / len(sa | sb)
        est = sum(x == y for x, y in zip(sig[a], sig[b])) / 64
        errs.append(abs(est - true_j))
    assert max(errs) < 0.2, errs
    assert sum(errs) / len(errs) < 0.1, errs
