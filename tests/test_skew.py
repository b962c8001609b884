"""Salted-join equivalence + connector stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.operators.skew import salted_join
from datalake_worker_spark.sources.connectors import read_delta, read_iceberg


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    from datalake_worker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"), "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_brand"
    )
    plain = (
        li.join(p, "k")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    salted = (
        salted_join(li, p, "k", salt_buckets=4)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_skewed_key(spark):
    """One hot key (90% of rows) — salted result still exact."""
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(10000)], "k int, v long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k int, tag string")
    out = salted_join(big, dim, "k").groupBy("tag").agg(F.count("*").alias("n"))
    got = {r.tag: r.n for r in out.collect()}
    assert got == {"hot": 9000, "cold": 1000}


def _session_sets(rows):
    """Canonicalize session assignments: set of frozensets of event ids
    per (key, session) — invariant to session-id numbering."""
    groups: dict[tuple, set] = {}
    for r in rows:
        groups.setdefault((r.user_id, r.session_id), set()).add(r.event_id)
    return {frozenset(v) for v in groups.values()}


def test_sessionize_sliced_equivalent_on_events(spark, sf_dir):
    from datalake_worker_spark.operators.windows import sessionize, sessionize_sliced
    from datalake_worker_spark.sources import load_table

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    plain = sessionize(e, "user_id", "ts", 1800.0, "event_id").collect()
    # small slice (2h) forces many cross-slice merges on 30-min-gap sessions
    sliced = sessionize_sliced(
        e, "user_id", "ts", 1800.0, "event_id", slice_seconds=7200.0
    ).collect()
    assert _session_sets(plain) == _session_sets(sliced)
    # session ids themselves must match too (both 1-based in time order)
    assert sorted((r.user_id, r.event_id, r.session_id) for r in plain) == sorted(
        (r.user_id, r.event_id, r.session_id) for r in sliced
    )


def test_sessionize_sliced_giant_single_key(spark):
    """One user, 200k events spanning months — the giant-key case where
    plain sessionize serializes into a single task. The sliced variant
    shards on (key, slice); result must still be exact."""
    import datetime

    from datalake_worker_spark.operators.windows import sessionize_sliced

    base = datetime.datetime(2024, 1, 1)
    # event i at base + i*17 minutes: gap 1020s < 1800s within a burst;
    # every 50th event jumps 2 days → a new session every 50 events
    rows = []
    t = base
    for i in range(200_000):
        if i % 50 == 0 and i:
            t += datetime.timedelta(days=2)
        else:
            t += datetime.timedelta(seconds=1020)
        rows.append((1, t, i))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize_sliced(df, "user_id", "ts", 1800.0, "event_id")
    agg = out.groupBy("session_id").agg(F.count("*").alias("n")).collect()
    assert len(agg) == 4000  # 200k / 50 per session
    assert all(r.n == 50 for r in agg)


def test_connector_stubs_raise_cleanly(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="Delta"):
        read_delta(spark, str(tmp_path))
    with pytest.raises(NotImplementedError, match="Iceberg"):
        read_iceberg(spark, "t")


def test_temperature_resample_scalable_equivalent(spark, sf_dir):
    """The prefix-histogram formulation selects exactly the rows the
    windowed smp05 query selects — without a whole-key sort."""
    from datalake_worker_spark.functions.sampling import (
        smp05_temperature_resample,
        temperature_resample_scalable,
    )
    from datalake_worker_spark.sources import load_table

    windowed = {
        (r.lang, r.doc_id)
        for r in smp05_temperature_resample(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    scalable = {
        (r.lang, r.doc_id)
        for r in temperature_resample_scalable(d, "lang", "doc_id", total=100).collect()
    }
    assert windowed == scalable


def test_temperature_resample_scalable_boundary_only_window(spark):
    """A 50k-row single-key input: the exact rank runs only on one
    1/256th prefix bucket, and quotas are still honored exactly."""
    from datalake_worker_spark.functions.sampling import temperature_resample_scalable

    df = spark.range(50_000).select(
        F.lit("en").alias("lang"), F.col("id").alias("doc_id")
    )
    out = temperature_resample_scalable(df, "lang", "doc_id", total=1000)
    assert out.count() == 1000


def test_jdbc_partitioned_read_splits_tasks(spark, sf_dir):
    """The io17 JDBC scan must actually split into numPartitions range
    queries — a single-connection read is the JDBC scale failure mode."""
    from datalake_worker_spark.sources.connectors import (
        DERBY_EMBEDDED_DRIVER,
        read_jdbc,
        write_jdbc,
    )
    import os as _os
    import tempfile as _tf

    from datalake_worker_spark.sources import load_table
    from pyspark.sql import functions as F

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    url = f"jdbc:derby:{_os.path.join(_tf.mkdtemp(prefix='dlw_jdbcp_'), 'db')};create=true"
    write_jdbc(n, url, "NATION_P", DERBY_EMBEDDED_DRIVER)
    back = read_jdbc(
        spark, url, "NATION_P", DERBY_EMBEDDED_DRIVER,
        partitionColumn="n_nationkey", lowerBound=0, upperBound=25,
        numPartitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == n.count()
