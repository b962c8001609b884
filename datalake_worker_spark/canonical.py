"""Deterministic canonicalization + hashing of query results.

Used by the differential tests to compare a Spark DataFrame against a
DuckDB result on the same inputs. Rules (FIXTURES.md "Determinism"):
sort by all output columns, floats rounded to 6 dp, timestamps ISO-8601
UTC, fixed NULL sentinel. Columns are sorted by name first so that
column order never matters.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

NULL = "\x00NULL\x00"
FLOAT_DP = 6


def _cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, FLOAT_DP)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        return f"{r:.{FLOAT_DP}f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _cell(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Render rows as sorted canonical strings, columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["\x01".join(_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def result_hash(columns: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(columns, rows):
        h.update(line.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows
