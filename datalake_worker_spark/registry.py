"""The declared query surface (SURVEY.md §2.2 correctness contract).

Every implemented operator registers here as a named pair:
  - ``spark_fn(spark, sf_dir) -> DataFrame``   — the engine query
  - ``oracle_sql`` (or None)                    — equivalent ANSI SQL for DuckDB
                                                  over the same parquet tables

``__spark_entry__.py`` re-exports this registry to the driver; the pytest
suite runs every pair differentially at small SF.

Determinism rules baked into every query:
  - every computed column is aliased identically in Spark and SQL;
  - float aggregations go through DECIMAL casts (order-independent, exact)
    and are cast back to DOUBLE at the end;
  - integer sums are cast to BIGINT in SQL (DuckDB widens to HUGEINT);
  - top-k always breaks ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None  # None => non-SQL-expressible; rows-only check
    category: str = "relational"
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle_sql: str | None, category: str = "relational", doc: str = ""):
    """Decorator: declare an operator query."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle_sql, category, doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {n: s.spark_fn for n, s in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: s.oracle_sql for n, s in REGISTRY.items() if s.oracle_sql is not None}


_LOADED = False


def _load_all():
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import asof, misc, relational, setops, scalars, tpch_extra, udfs, windows  # noqa: F401
    from .functions import dedup, multimodal, sampling, setsim, similarity, text, textrank  # noqa: F401
    from .sources import roundtrip  # noqa: F401
    from . import catalog_queries  # noqa: F401
    from .streaming import ops, stateful  # noqa: F401

    _LOADED = True
