"""Unit tests for the canonicalization layer every oracle test rides on."""

from __future__ import annotations

from datetime import date, datetime

from datalake_worker_spark.canonical import canonical_rows, result_hash


def test_column_order_insensitive():
    h1 = result_hash(["a", "b"], [(1, 2), (3, 4)])
    h2 = result_hash(["b", "a"], [(2, 1), (4, 3)])
    assert h1 == h2


def test_row_order_insensitive():
    h1 = result_hash(["a"], [(1,), (2,)])
    h2 = result_hash(["a"], [(2,), (1,)])
    assert h1 == h2


def test_float_rounding_and_negative_zero():
    assert result_hash(["x"], [(0.1234567,)]) == result_hash(["x"], [(0.1234571,)])
    assert result_hash(["x"], [(-0.0,)]) == result_hash(["x"], [(0.0,)])
    assert result_hash(["x"], [(1.0,)]) != result_hash(["x"], [(2.0,)])


def test_null_distinct_from_strings():
    assert result_hash(["x"], [(None,)]) != result_hash(["x"], [("None",)])
    assert result_hash(["x"], [(None,)]) != result_hash(["x"], [("",)])


def test_timestamps_and_dates():
    rows = [(datetime(2024, 1, 1, 12, 30, 45, 123456),), (date(2024, 1, 1),)]
    lines = canonical_rows(["t"], rows)
    assert "2024-01-01T12:30:45.123456" in lines[1] or "2024-01-01T12:30:45.123456" in lines[0]


def test_nested_collections():
    h1 = result_hash(["x"], [([1.0, 2.0],)])
    h2 = result_hash(["x"], [([1.0000001, 1.9999999],)])
    assert h1 == h2
    assert result_hash(["x"], [({"b": 1, "a": 2},)]) == result_hash(
        ["x"], [({"a": 2, "b": 1},)]
    )
