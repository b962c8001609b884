"""Round-9 operator tests: a17 DDSketch quantiles (merge identity,
planted accuracy, plan gate) and st20 SpaceSaving heavy hitters (merge
rule units, planted streaming heavy hitter, invariants under a binding
counter cap)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datalake_worker_spark.operators.wave9 import (
    DD_ALPHA,
    ddsketch_buckets,
    ddsketch_quantiles,
)
from datalake_worker_spark.plans.inspect import simple_plan
from datalake_worker_spark.registry import REGISTRY, _load_all
from datalake_worker_spark.streaming.spacesaving import (
    merge_summaries,
    run_spacesaving_topk,
)

_load_all()


def _planted_values(spark):
    # 1..2000 uniform, exact quantiles known: p50=1000(.5), p90=1800(.1)
    return spark.range(1, 2001).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v")
    )


def test_ddsketch_planted_accuracy(spark):
    d = _planted_values(spark)
    out = ddsketch_quantiles(ddsketch_buckets(d, "grp", "v")).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_values == 2000
    xs = list(range(1, 2001))
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = xs[math.floor(q * (len(xs) - 1))]
        rel = abs(getattr(r, name) - exact) / exact
        assert rel <= DD_ALPHA, (name, getattr(r, name), exact, rel)


def test_ddsketch_merge_identity(spark):
    """The sketch is a counter map: computing it over any partitioning
    of the data yields identical counters, hence identical estimates —
    counter addition IS the merge (mergeable-summary contract)."""
    d = _planted_values(spark)
    whole = ddsketch_quantiles(ddsketch_buckets(d, "grp", "v")).collect()[0]
    halves = d.filter(F.col("v") <= 1000).unionByName(
        d.filter(F.col("v") > 1000).repartition(17)
    )
    merged = ddsketch_quantiles(
        ddsketch_buckets(halves, "grp", "v")
    ).collect()[0]
    assert whole == merged


def test_ddsketch_plan_bounded(spark, sf_dir):
    """Plan gate: the counter build is ONE partial-aggregated groupBy
    (map-side merge), and the quantile pass runs over counter rows —
    the window and final groupBy share the hashpartitioning(g) exchange,
    so the whole query has exactly two exchanges and no data-scale
    single-partition stage."""
    df = REGISTRY["a17_ddsketch_quantiles"].spark_fn(spark, sf_dir)
    df.collect()
    # AQE plans print Final + Initial sections; gate the FINAL one
    plan = simple_plan(df).split("== Initial Plan ==")[0]
    assert "partial_count" in plan  # map-side counter merge
    assert plan.count("Exchange hashpartitioning") <= 2
    # the windows must partition by g (bounded counter rows per group),
    # never run unpartitioned
    assert "windowspecdefinition(g#" in plan


def test_spacesaving_merge_rule():
    # vocab fits: merge of exact summaries stays exact, floor 0
    top, floor = merge_summaries(({"a": 5, "b": 3}, 0), ({"a": 2}, 0), 4)
    assert top == {"a": 7, "b": 3} and floor == 0
    # cap binds: absent side contributes its floor; dropped max and
    # floor-sum both bound the new floor
    top, floor = merge_summaries(
        ({"a": 5, "b": 3}, 1), ({"a": 2, "c": 4}, 0), 2
    )
    # est: a=7, b=3+0=3, c=4+1=5 -> keep {a:7, c:5}, dropped b at 3,
    # floor = max(3, 1+0) = 3
    assert top == {"a": 7, "c": 5} and floor == 3
    # deterministic tie-break on token
    top, _ = merge_summaries(({"x": 2, "y": 2}, 0), ({}, 0), 1)
    assert top == {"x": 2}


def test_spacesaving_planted_heavy_hitter(spark, tmp_path):
    """One token planted in every doc across 3 batches must surface
    with est >= true under a binding m=8 cap; invariants I1-I3 hold
    against exact Python counts."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    exact = Counter()
    for d in range(300):
        text = f"heavy u{d}_a u{d}_b"  # 'heavy' in every doc + noise
        rows.append(dict(doc_id=d, text=text))
        exact.update(text.split())
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "docs.parquet")
    )
    d = spark.read.parquet(str(tmp_path / "docs.parquet"))
    batches = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    top, floor, root = run_spacesaving_topk(spark, batches, m=8)
    assert "heavy" in top
    assert top["heavy"] >= exact["heavy"] == 300
    assert all(est >= exact[k] for k, est in top.items())  # I1
    assert all(est - exact[k] <= floor for k, est in top.items())  # I2
    assert all(k in top for k, c in exact.items() if c > floor)  # I3
    assert floor > 0  # the cap actually bound (noise vocab 600 >> m)


def test_spacesaving_registry_query(spark, sf_dir):
    out = REGISTRY["st20_spacesaving_topk"].spark_fn(spark, sf_dir).collect()
    assert len(out) == 20
    assert [r.rn for r in out] == list(range(1, 21))
    ests = [r.est for r in out]
    assert ests == sorted(ests, reverse=True)


def test_cdc_chunking_insertion_robust(spark, tmp_path):
    """The CDC selling point vs m07's fixed-size chunks: inserting ONE
    word near the start of a long document perturbs only the chunk
    containing it — boundaries resynchronize at the next cut word — so
    most chunk hashes are shared with the original. Fixed-size (m07)
    chunking shifts every byte after the insertion: zero shared chunks
    from there on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    base_words = [f"w{i}" for i in range(400)]
    base = " ".join(base_words)
    inserted = " ".join(base_words[:3] + ["INSERTED"] + base_words[3:])
    t = pa.Table.from_pylist(
        [
            dict(doc_id=0, text=base, lang="en", source="a", n_chars=len(base)),
            dict(doc_id=1, text=inserted, lang="en", source="b",
                 n_chars=len(inserted)),
        ]
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in REGISTRY["m08_cdc_chunking"].spark_fn(spark, str(tmp_path))
        .collect()
    }
    # per-source audit can't see cross-doc sharing; recompute chunk shas
    # per doc via the same operator at doc granularity using the audit's
    # distinct counts over a combined source
    t2 = pa.Table.from_pylist(
        [
            dict(doc_id=0, text=base, lang="en", source="s", n_chars=len(base)),
            dict(doc_id=1, text=inserted, lang="en", source="s",
                 n_chars=len(inserted)),
        ]
    )
    pq.write_table(t2, str(tmp_path / "documents.parquet"))
    both = REGISTRY["m08_cdc_chunking"].spark_fn(spark, str(tmp_path)).collect()[0]
    n_a, n_b = out["a"].n_chunks, out["b"].n_chunks
    shared = n_a + n_b - both.n_distinct_chunks
    # nearly all of the original doc's chunks must be recovered in the
    # perturbed doc (everything after the first post-insertion boundary)
    assert shared >= n_a - 3, (n_a, n_b, both.n_distinct_chunks, shared)
    # sanity: the insertion DID change at least one chunk
    assert shared < n_a or n_b > n_a


def test_spacesaving_merge_invariants_property():
    """Property test (pure Python, no Spark): for random token streams
    split into random batches and folded through merge_summaries with a
    small m, the three SpaceSaving invariants hold vs exact counts at
    every fold step — est >= true (I1), est - true <= floor (I2), every
    true count > floor tracked (I3)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        tokens=st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=400
        ),
        n_batches=st.integers(min_value=1, max_value=5),
        m=st.integers(min_value=2, max_value=8),
    )
    def run(tokens, n_batches, m):
        batches = [tokens[i::n_batches] for i in range(n_batches)]
        state = ({}, 0)
        exact = Counter()
        for b in batches:
            c = Counter(str(t) for t in b)
            ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            top = dict(ranked[:m])
            floor = ranked[m][1] if len(ranked) > m else 0
            state = merge_summaries(state, (top, floor), m)
            exact.update(str(t) for t in b)
            est, f = state
            assert all(v >= exact[k] for k, v in est.items())  # I1
            assert all(v - exact[k] <= f for k, v in est.items())  # I2
            assert all(k in est for k, c0 in exact.items() if c0 > f)  # I3

    run()


def test_ddsketch_constant_and_tiny_groups(spark):
    """All-equal values: every quantile lands in the same bucket, so
    p50 = p90 = p99 and each is within alpha of the value. A 1-row
    group must not crash the rank arithmetic (floor(q*0) + 1 = 1)."""
    rows = [("c", 42.0)] * 50 + [("one", 7.0)]
    d = spark.createDataFrame(rows, "grp string, v double")
    out = {
        r.g: r
        for r in ddsketch_quantiles(
            ddsketch_buckets(d, "grp", "v")
        ).collect()
    }
    c = out["c"]
    assert c.p50 == c.p90 == c.p99
    assert abs(c.p50 - 42.0) / 42.0 <= DD_ALPHA
    assert out["one"].n_values == 1
    assert abs(out["one"].p99 - 7.0) / 7.0 <= DD_ALPHA


def test_spacesaving_empty_batch(spark, tmp_path):
    """A micro-batch with zero rows must fold as a no-op (empty summary,
    floor 0) instead of corrupting or resetting the state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [dict(doc_id=d, text="alpha beta") for d in range(10)]
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "docs.parquet")
    )
    d = spark.read.parquet(str(tmp_path / "docs.parquet"))
    batches = [
        d,
        d.filter(F.col("doc_id") < 0),  # empty
        d.filter(F.col("doc_id") == 0),
    ]
    top, floor, _ = run_spacesaving_topk(spark, batches, m=8)
    assert top == {"alpha": 11, "beta": 11} and floor == 0


def test_spacesaving_state_dir_pruned(spark, tmp_path):
    """ADVICE r9: epoch e's summary folds all history, so after the run
    only the newest state file and its replay-safety predecessor may
    remain — the directory (and _read_latest_state's listdir scan) is
    O(1) in stream length, matching the module's O(m)-forever claim."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [dict(doc_id=d, text=f"tok{d % 5} common") for d in range(60)]
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "docs.parquet")
    )
    d = spark.read.parquet(str(tmp_path / "docs.parquet"))
    batches = [d.filter(F.col("doc_id") % 6 == i) for i in range(6)]
    top, floor, root = run_spacesaving_topk(spark, batches, m=8)
    states = sorted(
        f for f in os.listdir(root)
        if f.startswith("state_") and f.endswith(".json")
    )
    assert len(states) <= 2, states
    # the survivor IS the newest epoch — the final read still works
    assert top["common"] == 60 and floor == 0


def test_cdc_chunking_single_word_docs(spark, tmp_path):
    """One-word documents: exactly one chunk each regardless of whether
    the word is a cut word (the boundary closes the chunk it ends)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        dict(doc_id=i, text=f"solo{i}", lang="en", source="s", n_chars=6)
        for i in range(20)
    ]
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    out = REGISTRY["m08_cdc_chunking"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_chunks == 20 and out[0].avg_chunk_words == 1.0


def test_temporal_anti_join_planted(spark, tmp_path):
    """Three purchases: click 30 min before (matched), click 2 h before
    (orphan — outside tolerance), no click at all (orphan)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def ev(eid, uid, ts, typ):
        return dict(event_id=eid, user_id=uid, ts=ts, value=1.0,
                    event_type=typ, props="{}")

    rows = [
        ev(1, 7, t0 - dt.timedelta(minutes=30), "click"),
        ev(2, 7, t0, "purchase"),                       # matched
        ev(3, 8, t0 - dt.timedelta(hours=2), "click"),
        ev(4, 8, t0, "purchase"),                       # stale -> orphan
        ev(5, 9, t0, "purchase"),                       # no click -> orphan
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in REGISTRY["x09_temporal_anti_join"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[7].n_orphans == 0 and out[7].n_purchases == 1
    assert out[8].n_orphans == 1 and out[8].orphan_ratio == 1.0
    assert out[9].n_orphans == 1
