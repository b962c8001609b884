"""Round-11 operators: q26 nation PageRank, t33 decision stump."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


# ----------------------------------------------------------------- q26
def test_q26_mass_conservation_and_positivity(spark, sf_dir):
    """Fixed-point PageRank: every rank positive; total mass stays
    within the truncation slack of ONE (each // loses < 1 unit per
    edge/node per round — mass can only leak DOWN, never appear)."""
    from datalake_worker_spark.operators.wave12 import Q26_ONE

    rows = REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.rank_fp > 0 for r in rows)
    total = sum(r.rank_fp for r in rows)
    assert total <= Q26_ONE
    assert total >= int(0.95 * Q26_ONE)
    for r in rows:
        assert abs(r.pagerank - r.rank_fp / Q26_ONE) < 1e-12


def test_q26_deterministic(spark, sf_dir):
    a = sorted(
        map(tuple, REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir).collect())
    )
    assert a == b


def test_q26_python_reference(spark, sf_dir):
    """Bit-identical to a pure-Python integer power iteration over the
    collected edge list — the same differential discipline t30/t31
    use against their python references."""
    from datalake_worker_spark.operators.wave12 import (
        Q26_D_DEN,
        Q26_D_NUM,
        Q26_ITERS,
        Q26_ONE,
    )
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    ew = [(int(r.src), int(r.dst), int(r.w)) for r in edges]
    nodes = sorted({s for s, _, _ in ew} | {d for _, d, _ in ew})
    n = len(nodes)
    outw: dict[int, int] = {}
    for s, _, w in ew:
        outw[s] = outw.get(s, 0) + w
    r = {v: Q26_ONE // n for v in nodes}
    base = ((Q26_D_DEN - Q26_D_NUM) * Q26_ONE) // (Q26_D_DEN * n)
    for _ in range(Q26_ITERS):
        contrib = {v: 0 for v in nodes}
        for s, d, w in ew:
            contrib[d] += (r[s] * w) // outw[s]
        dang = sum(r[v] for v in nodes if v not in outw)
        de = dang // n
        r = {
            v: base + (Q26_D_NUM * (contrib[v] + de)) // Q26_D_DEN
            for v in nodes
        }
    got = {
        x.nationkey: x.rank_fp
        for x in REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir).collect()
    }
    assert got == r


# ----------------------------------------------------------------- t33
def test_t33_stump_is_brute_force_optimal(spark, sf_dir):
    """The distributed histogram split search must pick exactly the
    split a brute-force scan over the collected features picks, with
    the identical integer score."""
    from datalake_worker_spark.operators.wave12 import T33_SCALE, _t33_features
    from datalake_worker_spark.sources import load_table

    feats = _t33_features(load_table(spark, sf_dir, "documents")).collect()
    best = None  # (score, feature, threshold)
    for fname in ("n_chars", "n_punct", "n_tok"):
        vals = sorted({int(getattr(r, fname)) for r in feats})
        n = len(feats)
        c1t = sum(int(r.y) for r in feats)
        for t in vals[:-1]:
            nl = sum(1 for r in feats if int(getattr(r, fname)) <= t)
            c1l = sum(
                int(r.y) for r in feats if int(getattr(r, fname)) <= t
            )
            nr, c1r = n - nl, c1t - c1l
            num = nr * ((nl - c1l) ** 2 + c1l**2) + nl * (
                (nr - c1r) ** 2 + c1r**2
            )
            score = (T33_SCALE * num) // (nl * nr)
            cand = (-score, fname, t)
            if best is None or cand < best:
                best = cand
    rows = REGISTRY["t33_decision_stump"].spark_fn(spark, sf_dir).collect()
    assert rows
    got = (-int(rows[0].score_fp), rows[0].feature, int(rows[0].threshold))
    assert got == best
    # every row carries the same stump; predictions follow the split
    assert len({(r.feature, r.threshold, r.score_fp) for r in rows}) == 1


def test_t33_predictions_are_side_majorities(spark, sf_dir):
    rows = REGISTRY["t33_decision_stump"].spark_fn(spark, sf_dir).collect()
    by_side: dict[int, list] = {0: [], 1: []}
    from datalake_worker_spark.operators.wave12 import _t33_features
    from datalake_worker_spark.sources import load_table

    feats = {
        r.doc_id: r
        for r in _t33_features(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    fname, thr = rows[0].feature, int(rows[0].threshold)
    for r in rows:
        side = 0 if int(getattr(feats[r.doc_id], fname)) <= thr else 1
        by_side[side].append(r)
    for side, members in by_side.items():
        if not members:
            continue
        labels = [int(feats[m.doc_id].y) for m in members]
        maj = 1 if 2 * sum(labels) > len(labels) else 0
        assert all(int(m.predicted) == maj for m in members), side


def test_q26_plan_no_global_sort_and_broadcast_dims(spark, sf_dir):
    """The edge build broadcasts both nation dims (no fact-fact
    shuffle for the key lookup) and nothing range-partitions."""
    from datalake_worker_spark.plans.inspect import simple_plan

    df = REGISTRY["q26_nation_pagerank"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert "rangepartitioning" not in plan.lower()


def test_t33_histogram_has_partial_aggregation(spark, sf_dir):
    """The per-(feature, value) histogram must partial-aggregate
    map-side (combinable counts), and the window runs over distinct
    VALUES per feature, never rows."""
    from datalake_worker_spark.operators.wave12 import _t33_features
    from datalake_worker_spark.plans.inspect import simple_plan
    from datalake_worker_spark.sources import load_table

    feat = _t33_features(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import functions as F

    per_val = feat.select(
        "y", F.lit("n_chars").alias("feature"), F.col("n_chars").alias("x")
    ).groupBy("feature", "x").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("c1")
    )
    plan = simple_plan(per_val)
    assert "partial" in plan.lower(), plan


def test_t33_score_expr_no_long_wrap(spark):
    """ADVICE r11 (medium): the Gini numerator is ~n^3/4 and silently
    wraps LONG beyond ~2e6 rows per feature. The score expression must
    compute decimal-first: plant cumulative counts big enough that the
    old long-product path wraps, and pin the result to exact Python
    integer arithmetic (= the oracle's HUGEINT)."""
    from datalake_worker_spark.operators.wave12 import T33_SCALE, t33_score_fp_sql

    nl, c1l, n, c1t = 2_500_000, 1_000_000, 5_000_000, 2_000_000
    nr, c1r = n - nl, c1t - c1l
    num = nr * ((nl - c1l) ** 2 + c1l**2) + nl * ((nr - c1r) ** 2 + c1r**2)
    assert num >= 2**63  # the planted case genuinely exceeds LONG
    expected = (T33_SCALE * num) // (nl * nr)
    row = (
        spark.createDataFrame(
            [(nl, c1l, n, c1t)], "nl long, c1l long, n long, c1t long"
        )
        .selectExpr(t33_score_fp_sql())
        .collect()[0]
    )
    assert int(row.score_fp) == expected


def test_q26_empty_input_returns_empty_frame(spark, tmp_path):
    """ADVICE r11: an empty lineitem slice must yield an empty frame
    with the declared schema, not ZeroDivisionError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schemas = {
        "lineitem": pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]
        ),
        "orders": pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        "customer": pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        "supplier": pa.schema(
            [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
    }
    for name, schema in schemas.items():
        pq.write_table(
            pa.Table.from_pylist([], schema=schema),
            str(tmp_path / f"{name}.parquet"),
        )
    df = REGISTRY["q26_nation_pagerank"].spark_fn(spark, str(tmp_path))
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == [
        "nationkey", "rank_fp", "pagerank",
    ]


# ----------------------------------------------------------------- d19
def test_d19_blocking_complete_for_ed1_and_filters_ed2(spark, tmp_path):
    """Deletion-neighborhood completeness: an insert, a delete and a
    substitute pair are all found; the transposition 'ab'/'ba' (ed 2)
    shares deletion variants but must be filtered by the exact verify;
    an unrelated name has zero neighbors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [
        "kitten", "kittens",   # insert  (ed 1)
        "sitting", "siting",   # delete  (ed 1)
        "flame", "blame",      # substitute (ed 1)
        "ab", "ba",            # transposition: ed 2, shares variants
        "zzzzzz",              # isolated
    ]
    t = pa.Table.from_pylist(
        [dict(c_custkey=i, c_name=n) for i, n in enumerate(names)]
    )
    pq.write_table(t, str(tmp_path / "customer.parquet"))
    rows = {
        r.name: r
        for r in REGISTRY["d19_symspell_typo_pairs"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert rows["kitten"].n_neighbors == 1 and rows["kitten"].nearest == "kittens"
    assert rows["sitting"].n_neighbors == 1 and rows["sitting"].nearest == "siting"
    assert rows["flame"].n_neighbors == 1 and rows["flame"].nearest == "blame"
    assert rows["ab"].n_neighbors == 0 and rows["ab"].nearest is None
    assert rows["ba"].n_neighbors == 0
    assert rows["zzzzzz"].n_neighbors == 0
