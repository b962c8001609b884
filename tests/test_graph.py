"""Behavioral tests for connected components / duplicate clustering
(functions/graph.py): planted component structure, chain convergence
(the pointer-jumping case), singleton handling. Cross-engine oracle
equivalence of d10 is covered by test_oracle_queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_worker_spark.functions.graph import (
    connected_components,
    duplicate_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_components_and_min_label(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    out = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_via_pointer_jumping(spark):
    # a 64-node path graph: neighbor-min alone needs ~64 rounds, the
    # pointer-jump step must bring it inside the 25-round budget
    e = _edges(spark, [(i, i + 1) for i in range(64)])
    out = connected_components(e).collect()
    assert len(out) == 65
    assert {r["component"] for r in out} == {0}


def test_edge_direction_and_duplicates_irrelevant(spark):
    out1 = connected_components(_edges(spark, [(5, 2), (2, 5), (5, 2)])).collect()
    assert {(r["node"], r["component"]) for r in out1} == {(2, 2), (5, 2)}


def test_max_rounds_raises(spark):
    e = _edges(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_rounds=1)


def test_duplicate_clusters_assigns_singletons_and_representatives(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 4)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: r for r in duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    assert {k: v["component_id"] for k, v in rows.items()} == {
        0: 0, 1: 1, 2: 2, 3: 0, 4: 0, 5: 5,
    }
    assert {k: v["n_members"] for k, v in rows.items()} == {
        0: 3, 1: 1, 2: 1, 3: 3, 4: 3, 5: 1,
    }
    assert sorted(k for k, v in rows.items() if v["keep"] == 1) == [0, 1, 2, 5]


def test_d10_keep_set_consistent_with_pairs(spark, sf_dir):
    """End-to-end on testdata: exactly one representative per cluster,
    components reproduce the pair evidence (every pair lands in one
    cluster), and keep-count equals the number of distinct clusters."""
    from datalake_worker_spark.functions.dedup import d03_ngram_jaccard_pairs
    from datalake_worker_spark.functions.graph import d10_duplicate_clusters

    out = d10_duplicate_clusters(spark, sf_dir).collect()
    comp = {r["doc_id"]: r["component_id"] for r in out}
    kept = sum(r["keep"] for r in out)
    assert kept == len({r["component_id"] for r in out})
    for p in d03_ngram_jaccard_pairs(spark, sf_dir).collect():
        assert comp[p["id_a"]] == comp[p["id_b"]]
    # every representative is its cluster's min id
    for r in out:
        assert comp[r["component_id"]] == r["component_id"]
        assert r["component_id"] <= r["doc_id"]
