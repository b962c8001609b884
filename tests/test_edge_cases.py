"""Edge-case unit tests on tiny literal DataFrames (SURVEY.md §5.2):
empty inputs, all-NULL keys, boundary values, duplicate rows."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_worker_spark.operators.asof import asof_join
from datalake_worker_spark.functions.dedup import (
    exact_jaccard,
    near_dup_pairs_minhash,
    simhash64,
    word_shingles,
)


def test_empty_input_aggregation(spark):
    e = spark.createDataFrame([], "k string, v double")
    out = e.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert out == []
    # global agg over empty input yields one row of NULL/0
    row = e.agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()[0]
    assert row.s is None and row.n == 0


def test_null_join_keys(spark):
    a = spark.createDataFrame([(1, "x"), (None, "y")], "k int, va string")
    b = spark.createDataFrame([(1, "p"), (None, "q")], "k int, vb string")
    inner = a.join(b, a.k.eqNullSafe(b.k) & a.k.isNotNull()).count()
    assert inner == 1  # plain equality drops NULL keys
    nullsafe = a.join(b, a.k.eqNullSafe(b.k)).count()
    assert nullsafe == 2  # <=> matches NULL with NULL
    left = a.join(b.withColumnRenamed("k", "bk"), a.k == F.col("bk"), "left").count()
    assert left == 2  # outer keeps the NULL-key row unmatched


def test_window_on_single_row_and_ties(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "id int, v double")
    # rank over the tied value alone: all rank 1
    wv = W.orderBy(F.col("v").desc())
    ranks = {r.id: r.rk for r in df.select("id", F.rank().over(wv).alias("rk")).collect()}
    assert ranks == {1: 1, 2: 1, 3: 1}
    # row_number with the id tie-break: total order, deterministic
    w = W.orderBy(F.col("v").desc(), F.col("id").asc())
    rns = {r.id: r.rn for r in df.select("id", F.row_number().over(w).alias("rn")).collect()}
    assert rns == {1: 1, 2: 2, 3: 3}


def test_asof_no_match_is_null(spark):
    probes = spark.createDataFrame(
        [(1, 100, 10)], "event_id long, user_id long, ts long"
    )
    lookup = spark.createDataFrame(
        [(200, 5, 99)], "user_id long, ts long, val long"
    )  # different user → no match
    out = asof_join(
        probes, lookup, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["val"], tie_col="val",
    ).collect()
    assert len(out) == 1 and out[0].asof_val is None


def test_asof_equal_timestamp_matches(spark):
    probes = spark.createDataFrame([(1, 7, 10)], "event_id long, user_id long, ts long")
    lookup = spark.createDataFrame([(7, 10, 42)], "user_id long, ts long, val long")
    out = asof_join(
        probes, lookup, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["val"], tie_col="val",
    ).collect()
    assert out[0].asof_val == 42  # "<=" semantics: same-ts row counts


def test_sessionize_invariants_random(spark):
    """Properties on random data: sessions partition each key's rows;
    intra-session consecutive gaps <= gap; a session's first row is
    > gap after the previous session's last row."""
    import random

    from datalake_worker_spark.operators.windows import sessionize

    rng = random.Random(17)
    rows = [
        (i, rng.randint(1, 4), float(rng.randint(0, 10_000)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, k int, ts double")
    out = sessionize(df, "k", "ts", gap_seconds=100.0, tie_col="id").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert sum(len(v) for v in by_key.values()) == len(rows)  # partition
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (r.ts, r.id))
        for prev, cur in zip(rs, rs[1:]):
            gap = cur.ts - prev.ts
            if cur.session_id == prev.session_id:
                assert gap <= 100.0, (k, prev, cur)
            else:
                assert cur.session_id == prev.session_id + 1
                assert gap > 100.0, (k, prev, cur)


def test_chunkmeta_validation():
    import pytest as _pytest

    from datalake_worker_spark.catalog import ChunkMeta

    with _pytest.raises(ValueError):
        ChunkMeta("d", "c", 10, 10)  # empty range
    with _pytest.raises(ValueError):
        ChunkMeta("d", "c", 10, 5)  # inverted
    with _pytest.raises(ValueError):
        ChunkMeta("d", "c", -1, 5)  # negative start


def test_asof_vs_bruteforce_random(spark):
    """Property: union+window as-of == brute-force max(right_ts <= left_ts)
    per probe, over random data with duplicate timestamps."""
    import random

    rng = random.Random(21)
    lookup = [
        (rng.randint(1, 5), rng.randint(0, 50), i)  # (user, ts, val=i)
        for i in range(60)
    ]
    probes = [
        (1000 + j, rng.randint(1, 5), rng.randint(0, 50)) for j in range(40)
    ]
    ldf = spark.createDataFrame(lookup, "user_id long, ts long, val long")
    pdf = spark.createDataFrame(probes, "event_id long, user_id long, ts long")
    out = {
        r.event_id: r.asof_val
        for r in asof_join(
            pdf, ldf, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["val"], tie_col="val",
        ).collect()
    }
    for eid, u, t in probes:
        cands = [(ts, v) for (lu, ts, v) in lookup if lu == u and ts <= t]
        want = max(cands)[1] if cands else None  # max (ts, tie) → its val
        assert out[eid] == want, (eid, u, t, out[eid], want)


def test_shingles_shorter_than_n(spark):
    df = spark.createDataFrame([(1, "one two")], "id int, text string")
    row = df.select(word_shingles("text", 3).alias("s")).collect()[0]
    assert row.s == ["one two"]  # whole-text fallback


def test_exact_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"], ["a", "b"]), (2, ["a"], ["b"]), (3, [], [])],
        "id int, x array<string>, y array<string>",
    )
    got = {r.id: r.j for r in df.select("id", exact_jaccard(F.col("x"), F.col("y")).alias("j")).collect()}
    assert got[1] == 1.0 and got[2] == 0.0 and got[3] == 0.0  # empty→0, not NaN


def test_minhash_identical_texts_are_collapsed_not_paired(spark):
    """Byte-identical texts are the exact-dedup operators' domain: the
    MinHash path collapses them to one representative pre-LSH (the
    hot-bucket scale guard), so they produce no near-dup pair."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    assert near_dup_pairs_minhash(df, "doc_id", "text", threshold=0.99).collect() == []


def test_minhash_distinct_texts_same_tokens_still_pair(spark):
    """Near-identical but not byte-equal texts still pair — the collapse
    only removes exact duplicates. The verified jaccard is the SHINGLE
    jaccard the minhash estimates (r7): one duplicated word leaves 4 of
    5 word-3-grams shared -> 0.8, not the token-set 1.0 the pre-r7
    verify reported (word order and repetition matter to near-dup-ness)."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    pairs = near_dup_pairs_minhash(df, "doc_id", "text", threshold=0.7).collect()
    assert len(pairs) == 1 and pairs[0].jaccard == 0.8
    # and word-scramble is NOT a 1.0 near-dup under the shingle measure
    df2 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "zeta epsilon delta gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    assert near_dup_pairs_minhash(df2, "doc_id", "text", threshold=0.7).collect() == []


def test_simhash_empty_vs_nonempty(spark):
    df = spark.createDataFrame([(1, ""), (2, "alpha")], "id int, text string")
    rows = df.select("id", simhash64("text").alias("s")).collect()
    assert len(rows) == 2  # no crash on empty text


def test_duplicate_rows_setops(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    b = spark.createDataFrame([(1,)], "k int")
    assert a.exceptAll(b).count() == 2  # one 1 and the 2 survive
    assert a.subtract(b).count() == 1  # distinct semantics: only 2
    assert a.intersect(b).count() == 1


def test_range_boundary_filters(spark):
    """Half-open semantics exactness at the boundary (D1 shape)."""
    df = spark.createDataFrame([(99,), (100,), (101,)], "n int")
    kept = sorted(
        r.n
        for r in df.filter((F.lit(100) <= F.col("n")) & (F.col("n") < 101)).collect()
    )
    assert kept == [100]


def test_t25_vocab_counts_short_docs(spark, tmp_path):
    """Add-one smoothing's V must count tokens from ALL docs — a
    one-word doc forms no bigram but its token is vocabulary (review
    r7: a >=2-token filter on the vocab side silently diverged the
    denominator from the SQL oracle on corpora with short docs)."""
    import duckdb

    from datalake_worker_spark.canonical import result_hash
    from datalake_worker_spark.registry import REGISTRY, _load_all

    _load_all()

    rows = [
        (1, "alpha beta gamma alpha beta", "en", "web", 27),
        (2, "xyzzy", "en", "web", 5),  # 1 word: no bigrams, 1 vocab entry
        (3, "beta gamma delta", "en", "web", 16),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    spec = REGISTRY["t25_bigram_logprob"]
    out = spec.spark_fn(spark, sf)
    scols, srows = out.columns, [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ores = con.execute(spec.oracle_sql).fetchall()
    ocols = [d[0] for d in con.description]
    assert len(srows) == len(ores) == 2  # doc 2 emits no bigram rows
    assert result_hash(scols, srows) == result_hash(ocols, ores)
