"""Type-level conformance of every oracle SQL string with the external
driver's comparator, so type bugs can't pass pytest and fail the driver.

Three type hazards have each burned a round:
  - tz-typed timestamps: DuckDB ``to_timestamp()`` returns TIMESTAMP
    WITH TIME ZONE while Spark windows are naive TIMESTAMP — rows match,
    schema/hash don't (st01/st02, round 3);
  - nested result cells (LIST/STRUCT/MAP): the driver's canonicalizer
    only handles scalar cells (a08, round 1);
  - DECIMAL/HUGEINT surfacing: DuckDB widens integer SUM to HUGEINT and
    exact sums to DECIMAL, which arrow renders differently from Spark's
    DOUBLE/BIGINT (s09, round 1).

Checks are metadata-only (``DESCRIBE <sql>`` plans without executing),
so this runs in milliseconds per query.
"""

from __future__ import annotations

import duckdb
import pytest

from datalake_worker_spark import registry
from datalake_worker_spark.sources import TABLES

from .conftest import SF_SMOKE

registry._load_all()
WITH_ORACLE = sorted(
    n for n in registry.REGISTRY if registry.REGISTRY[n].oracle_sql is not None
)

# substrings of DuckDB type names the driver comparator cannot canonicalize
_FORBIDDEN = (
    "WITH TIME ZONE",  # tz-aware timestamp: Spark side is always naive
    "TIMESTAMPTZ",
    "DECIMAL",  # arrow decimal128 vs Spark double/long
    "HUGEINT",  # arrow renders as decimal128(38,0)
    "[]",  # LIST
    "STRUCT(",
    "MAP(",
    "UNION(",
)


@pytest.fixture(scope="module")
def describe_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_types_are_driver_safe(name, describe_con):
    sql = registry.REGISTRY[name].oracle_sql
    cols = describe_con.execute(f"DESCRIBE {sql}").fetchall()
    assert cols, f"[{name}] DESCRIBE returned no columns"
    offenders = [
        (cname, ctype)
        for cname, ctype, *_ in cols
        if any(tok in ctype.upper() for tok in _FORBIDDEN)
    ]
    assert not offenders, (
        f"[{name}] oracle result types the driver comparator can't "
        f"canonicalize: {offenders} — cast to naive TIMESTAMP / DOUBLE / "
        f"BIGINT / scalar in the oracle SQL"
    )
