"""The differential gate: every registered query with an oracle must
hash-match DuckDB on the same parquet inputs (sf0.001 here for speed;
the driver re-runs the same contract at sf0.01)."""

from __future__ import annotations

import pytest

from datalake_worker_spark import registry

from .conftest import assert_matches_oracle

registry._load_all()
ALL = sorted(registry.REGISTRY)
WITH_ORACLE = [n for n in ALL if registry.REGISTRY[n].oracle_sql is not None]
NO_ORACLE = [n for n in ALL if registry.REGISTRY[n].oracle_sql is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, sf_dir, oracle):
    spec = registry.REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, spec.oracle_sql, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_runs(name, spark, sf_dir):
    spec = registry.REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
