"""Shared helpers for deterministic cross-engine aggregation.

Floating-point SUM/AVG are order-dependent; Spark and DuckDB will not
accumulate doubles in the same order, so every money-ish aggregate goes
through DECIMAL (exact, order-independent) and is cast back to DOUBLE
at the end. The test data carries 2-decimal money values, so
DECIMAL(18,2) / DECIMAL(4,2) casts are lossless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# money-valued column (prices, balances, quantities)
MONEY = "decimal(18,2)"
# rate-valued column (discount, tax: 0.00-1.00)
RATE = "decimal(4,2)"


def dec(col, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col, typ: str = MONEY) -> Column:
    """Exact, order-independent SUM for float money columns → DOUBLE."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col, typ: str = MONEY) -> Column:
    """AVG as exact decimal SUM / COUNT → DOUBLE (same formula as oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    one = F.lit(1).cast(RATE)
    return dec("l_extendedprice") * (one - dec("l_discount", RATE))


# Oracle-side SQL fragments (kept adjacent so both sides stay in sync).
SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def sql_cast_double(expr: str) -> str:
    """DECIMAL -> DOUBLE via VARCHAR in the oracle: DuckDB's direct
    decimal->double cast is not always correctly rounded (measured 1 ulp
    off nearest on a 2.7e10-magnitude DECIMAL(38,6) sum at the 10x
    corpus, while the JVM's BigDecimal.doubleValue was exact) — the
    string round-trip goes through strtod, which rounds to nearest on
    both engines."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def sql_dsum(col: str, typ: str = "DECIMAL(18,2)") -> str:
    return sql_cast_double(f"SUM(CAST({col} AS {typ}))")


def sql_davg(col: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"{sql_cast_double(f'SUM(CAST({col} AS {typ}))')} / COUNT({col})"
