"""Shared pytest fixtures: one SparkSession per run, a DuckDB oracle
connection with the test tables registered as views, and the
differential-comparison helper used by every oracle test."""

from __future__ import annotations

import os
import sys

import time

import duckdb
import pytest

# PySpark's collect() renders TimestampType through the PROCESS timezone
# (datetime.fromtimestamp), not spark.sql.session.timeZone — pin the
# process to UTC so canonical hashes are machine-independent.
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_worker_spark.canonical import (  # noqa: E402
    canonical_rows,
    duckdb_result,
    result_hash,
    spark_result,
)
from datalake_worker_spark.session import get_spark  # noqa: E402
from datalake_worker_spark.sources import TABLES  # noqa: E402

SF_SMOKE = os.environ.get("DLW_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dlw-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_matches_oracle(df, con, sql: str, name: str = "?"):
    scols, srows = spark_result(df)
    ocols, orows = duckdb_result(con, sql)
    assert sorted(scols) == sorted(ocols), (
        f"[{name}] column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"[{name}] row count mismatch: spark={len(srows)} oracle={len(orows)}"
    )
    sh, oh = result_hash(scols, srows), result_hash(ocols, orows)
    if sh != oh:
        s_can = canonical_rows(scols, srows)
        o_can = canonical_rows(ocols, orows)
        diff = [
            (a, b) for a, b in zip(s_can, o_can) if a != b
        ][:5]
        raise AssertionError(
            f"[{name}] value hash mismatch; first diffs (spark vs oracle):\n"
            + "\n".join(f"  S {a}\n  O {b}" for a, b in diff)
        )
