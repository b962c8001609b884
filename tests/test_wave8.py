"""Round-8 operator tests: planted-case semantics plus plan gates for
the wave-8 curation ops (w19 drawdown, t27 novelty, t28 entropy,
smp14 dup weights, a16 CMS, d17 fuzzy decontamination)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datalake_worker_spark.plans.inspect import simple_plan
from datalake_worker_spark.registry import REGISTRY, _load_all

_load_all()


def test_max_drawdown_planted(spark, tmp_path):
    """Hand-computed drawdown: series 10, 5, 12, 3 -> running peaks
    10, 10, 12, 12 -> drawdowns 0, 5, 0, 9 -> max 9."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    rows = [
        (i, 7, dt.datetime(2024, 1, 1, 0, i), v, "c", "{}")
        for i, v in enumerate([10.0, 5.0, 12.0, 3.0])
    ]
    t = pa.Table.from_pylist(
        [
            dict(event_id=e, user_id=u, ts=ts, value=v, event_type=c, props=p)
            for e, u, ts, v, c, p in rows
        ]
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = REGISTRY["w19_max_drawdown"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].max_drawdown == 9.0
    assert out[0].n_events == 4


def test_ngram_novelty_planted(spark, tmp_path):
    """doc 0 owns all its grams (first doc); doc 1 repeats doc 0
    verbatim (novelty 0); doc 2 is half doc-0 text, half fresh."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "a b c d e f g h"  # grams(5): 4 distinct
    fresh = "p q r s t u v w"
    t = pa.Table.from_pylist(
        [
            dict(doc_id=0, text=base, lang="en", source="s", n_chars=len(base)),
            dict(doc_id=1, text=base, lang="en", source="s", n_chars=len(base)),
            dict(doc_id=2, text=fresh, lang="en", source="s", n_chars=len(fresh)),
        ]
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["t27_ngram_novelty"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out[0].novelty == 1.0
    assert out[1].novelty == 0.0
    assert out[2].novelty == 1.0
    assert out[0].n_grams == 4


def test_ngram_novelty_zipfian_skew(spark, tmp_path):
    """VERDICT r8 item 3: natural-text gram multiplicities are Zipfian —
    plant one boilerplate 5-gram shared by 30% of docs (a genuinely hot
    gram key) and pin (a) exact novelty results and (b) the join-free
    plan shape: the ONLY gram-keyed operation is the partial-agg-absorbed
    groupBy; every join keys on doc_id. The r8 join-back on gram was
    probed live: AQE's OptimizeSkewedJoin structurally cannot split it
    (the min() aggregate sits between the build-side shuffle and sort,
    so duplicating the partition would corrupt the aggregate)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "b0 b1 b2 b3 b4"  # exactly one hot 5-gram
    rows = []
    for d in range(4000):
        hot = d % 10 < 3  # 30% of docs carry the boilerplate gram
        text = boiler if hot else " ".join(f"u{d}_{j}" for j in range(9))
        rows.append(
            dict(doc_id=d, text=text, lang="en", source="s", n_chars=len(text))
        )
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    df = REGISTRY["t27_ngram_novelty"].spark_fn(spark, str(tmp_path))
    out = {r.doc_id: r for r in df.collect()}
    hot_ids = [d for d in range(4000) if d % 10 < 3]
    # the min hot doc owns the boilerplate gram; every other hot doc's
    # single gram is previously seen
    assert out[min(hot_ids)].novelty == 1.0 and out[min(hot_ids)].n_grams == 1
    assert all(out[d].novelty == 0.0 for d in hot_ids[1:])
    # non-hot docs: 5 unique grams each, all novel
    assert all(
        out[d].novelty == 1.0 and out[d].n_grams == 5
        for d in range(4000)
        if d % 10 >= 3
    )
    # plan gate: no join keyed on the gram column — joins key on doc_id
    plan = simple_plan(df)
    for m in re.finditer(r"SortMergeJoin \[([^\]]*)\]|ShuffledHashJoin \[([^\]]*)\]|BroadcastHashJoin \[([^\]]*)\]", plan):
        keys = next(g for g in m.groups() if g is not None)
        assert "gram" not in keys, f"gram-keyed join reappeared: {m.group(0)}"
    # and the hot gram IS aggregated with a map-side partial min
    assert "partial_min" in plan


def test_token_entropy_planted(spark, tmp_path):
    """'x x x x' -> H = 0; 'a b c d' -> H = 2 bits (uniform over 4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.Table.from_pylist(
        [
            dict(doc_id=0, text="x x x x", lang="en", source="s", n_chars=7),
            dict(doc_id=1, text="a b c d", lang="en", source="s", n_chars=7),
        ]
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["t28_token_entropy"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out[0].entropy == 0.0
    assert math.isclose(out[1].entropy, 2.0, abs_tol=1e-5)
    assert out[1].n_types == 4


def test_dup_aware_weights_planted(spark, tmp_path):
    """3 copies of one text + 1 unique in source A: effective 2 of 4;
    inflation 2.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [dict(doc_id=i, text="same page", lang="en", source="A", n_chars=9)
            for i in range(3)]
    rows.append(dict(doc_id=3, text="unique page", lang="en", source="A", n_chars=11))
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = REGISTRY["smp14_dup_aware_weights"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 4
    assert math.isclose(r.effective_docs, 2.0, abs_tol=1e-6)
    assert math.isclose(r.dup_inflation, 2.0, abs_tol=1e-5)


def test_cms_never_undercounts_on_skew(spark, tmp_path):
    """A mass-repeated token (the adversarial case for any sketch) must
    estimate AT LEAST its exact count, and the top-20 ranking must be
    the exact ranking."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [dict(doc_id=i, text="hot " * 50 + f"tail{i}", lang="en",
                 source="s", n_chars=10) for i in range(60)]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = sorted(
        REGISTRY["a16_cms_heavy_hitters"].spark_fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.rn,
    )
    assert out[0].tok == "hot" and out[0].exact_n == 3000
    for r in out:
        assert r.cms_n >= r.exact_n, (r.tok, r.cms_n, r.exact_n)
        assert r.over == r.cms_n - r.exact_n


def test_fuzzy_decontamination_planted(spark, tmp_path):
    """A corpus doc embedding a benchmark doc verbatim inside noise is
    caught (containment 1.0) even though its full-text Jaccard is low;
    an unrelated doc is not flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    noise = " ".join(f"w{i}" for i in range(40))
    rows = [
        dict(doc_id=0, text=bench, lang="en", source="s", n_chars=1),  # benchmark (0 % 25 == 0)
        dict(doc_id=1, text=noise + " " + bench + " " + noise, lang="en",
             source="s", n_chars=1),  # contaminated
        dict(doc_id=2, text="totally different content here entirely",
             lang="en", source="s", n_chars=1),  # clean
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = REGISTRY["d17_fuzzy_decontamination"].spark_fn(spark, str(tmp_path)).collect()
    got = {(r.doc_id, r.bench_id): r.containment for r in out}
    assert (1, 0) in got, got
    assert got[(1, 0)] == 1.0
    assert (2, 0) not in got


def test_d17_benchmark_side_broadcast(spark, sf_dir):
    """The benchmark side is fixed-size at any corpus scale — both the
    band probe and the gram verify must be broadcast joins (the corpus
    is never shuffled for pairing)."""
    df = REGISTRY["d17_fuzzy_decontamination"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_a16_probe_is_literal_mapside(spark, sf_dir):
    """The CMS re-enters the plan as a parsed literal: the estimate
    projection must not introduce a join against sketch state."""
    df = REGISTRY["a16_cms_heavy_hitters"].spark_fn(spark, sf_dir)
    plan = simple_plan(df)
    # exactly the aggregation + top-k machinery; no join operator at all
    assert "Join" not in plan, plan


def test_source_divergence_planted(spark, tmp_path):
    """Source A matches the corpus mix exactly when it IS the corpus;
    two disjoint-vocabulary sources each sit at TV = 0.5 from the
    pooled distribution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        dict(doc_id=0, text="a a b b", lang="en", source="A", n_chars=7),
        dict(doc_id=1, text="c c d d", lang="en", source="B", n_chars=7),
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in
           REGISTRY["t29_source_divergence"].spark_fn(spark, str(tmp_path)).collect()}
    # pooled: each of a,b,c,d has p=1/4; source A: a,b at 1/2 each.
    # TV = 0.5*(|1/2-1/4|*2 + |0-1/4|*2) = 0.5
    assert out["A"].tv_distance == 0.5
    assert out["B"].tv_distance == 0.5
    assert out["A"].n_tokens == 4


def test_wave8_invariants_on_corpus(spark, sf_dir):
    """Mathematical invariants over the real corpus: entropy bounded by
    log2(n_types), TV distance in [0,1], drawdown non-negative, novelty
    in (0,1], containment in [0.5,1], dup weights never exceed raw
    counts."""
    import math as m

    ent = REGISTRY["t28_token_entropy"].spark_fn(spark, sf_dir).collect()
    for r in ent:
        # each of n_types terms is rounded to 6 dp (the determinism
        # recipe), so the sum can exceed the exact bound by n_types*5e-7
        slack = r.n_types * 5e-7 + 1e-9
        assert -slack <= r.entropy <= m.log2(max(r.n_types, 1)) + slack, r
    tv = REGISTRY["t29_source_divergence"].spark_fn(spark, sf_dir).collect()
    for r in tv:
        assert 0.0 <= r.tv_distance <= 1.0, r
    dd = REGISTRY["w19_max_drawdown"].spark_fn(spark, sf_dir).collect()
    for r in dd:
        assert r.max_drawdown >= 0.0, r
    nov = REGISTRY["t27_ngram_novelty"].spark_fn(spark, sf_dir).collect()
    for r in nov:
        # 0.0 is legitimate: an exact duplicate of an earlier doc owns
        # none of its grams
        assert 0.0 <= r.novelty <= 1.0 and r.novel_grams <= r.n_grams, r
    dec = REGISTRY["d17_fuzzy_decontamination"].spark_fn(spark, sf_dir).collect()
    for r in dec:
        assert 0.5 - 1e-9 <= r.containment <= 1.0, r
    wts = REGISTRY["smp14_dup_aware_weights"].spark_fn(spark, sf_dir).collect()
    for r in wts:
        assert 0.0 < r.effective_docs <= r.n_docs + 1e-9, r
        assert r.dup_inflation >= 1.0 - 1e-9, r


def test_streaming_drift_psi_planted(spark, tmp_path):
    """Day 1 replays day 0's value mix (PSI ~ 0 up to smoothing of the
    slightly different totals); day 2 shifts every value into the top
    bucket (PSI >> 0). Every (p-q)ln(p/q) term is non-negative, so PSI
    is too."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for day, values in [
        (1, [10.0] * 20 + [100.0] * 20),
        (2, [10.0] * 20 + [100.0] * 20),
        (3, [480.0] * 40),
    ]:
        for i, v in enumerate(values):
            rows.append(dict(event_id=eid, ts=dt.datetime(2024, 1, day, 1, 0, i),
                             user_id=1, event_type="c", value=v, props="{}"))
            eid += 1
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    out = sorted(
        REGISTRY["st18_streaming_drift_psi"].spark_fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.w_start,
    )
    assert len(out) == 3
    assert out[0].psi == 0.0                   # baseline vs itself
    assert abs(out[1].psi) < 1e-6              # identical mix
    assert out[2].psi > 1.0, out[2]            # hard shift
    for r in out:
        assert r.psi >= -1e-9                  # PSI is non-negative


def test_chunk_dedup_manifest_planted(spark, tmp_path):
    """Two byte-identical 128-char docs + one unique 64-char doc: 5
    logical chunks, 3 distinct (the dup doc's two chunks collapse)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    page = "x" * 64 + "y" * 64
    rows = [
        dict(doc_id=0, text=page, lang="en", source="A", n_chars=128),
        dict(doc_id=1, text=page, lang="en", source="A", n_chars=128),
        dict(doc_id=2, text="z" * 64, lang="en", source="A", n_chars=64),
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = REGISTRY["m07_chunk_dedup_manifest"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_chunks, r.n_distinct_chunks) == (3, 5, 3)
    assert abs(r.dedup_ratio - 5 / 3) < 1e-6


def test_python_datasource_row_group_partitions(spark, tmp_path):
    """The custom source plans one InputPartition per parquet row group
    and its output matches the native parquet scan exactly."""
    from datalake_worker_spark.sources.pydatasource import (
        ChunkManifestReader,
        ensure_registered,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "orders.parquet")
    t = pa.table({"k": list(range(100)), "v": [float(i) for i in range(100)]})
    pq.write_table(t, path, row_group_size=25)  # 4 row groups

    ensure_registered(spark)
    df = (
        spark.read.format("dlw_chunk_manifest")
        .option("files", path)
        .option("schema_ddl", "k bigint, v double")
        .load()
    )
    assert df.count() == 100
    assert df.agg(F.sum("v")).collect()[0][0] == sum(range(100))
    # planning contract: 4 row groups -> 4 partitions
    from pyspark.sql.types import StructType

    reader = ChunkManifestReader(
        {"files": path}, StructType.fromDDL("k bigint, v double")
    )
    assert len(reader.partitions()) == 4


def test_python_stream_source_replays_all_row_groups(spark, tmp_path):
    """The stream source's offset jump must cover EVERY row group under
    availableNow (the probed pitfall: a cursor-advancing latestOffset
    returns only the first batch)."""
    from datalake_worker_spark.sources.pydatasource import ensure_stream_registered
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": list(range(100))}), path, row_group_size=25
    )  # 4 row groups
    ensure_stream_registered(spark)
    s = (
        spark.readStream.format("dlw_chunk_replay")
        .option("files", path)
        .option("schema_ddl", "k bigint")
        .load()
    )
    from datalake_worker_spark.streaming.ops import run_to_memory

    out = run_to_memory(
        s.groupBy().agg(F.count("*").alias("n"), F.max("k").alias("mx")),
        "complete",
    ).collect()
    assert (out[0].n, out[0].mx) == (100, 99)


def test_chunk_manifest_empty_text_no_phantom_chunks(spark, tmp_path):
    """An empty-text document contributes ZERO chunks (F.sequence(1, 0)
    yields a descending [1, 0], not an empty array — the review-r8
    phantom-chunk bug); counts must match the oracle's empty range."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        dict(doc_id=0, text="", lang="en", source="A", n_chars=0),
        dict(doc_id=1, text="x" * 64, lang="en", source="A", n_chars=64),
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = REGISTRY["m07_chunk_dedup_manifest"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_chunks, r.n_distinct_chunks) == (1, 1, 1), r
