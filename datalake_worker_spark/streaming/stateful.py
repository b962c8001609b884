"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 streaming: "custom stateful operators").

Running per-user totals: state = (n_events, total_value) per user_id,
updated each micro-batch, emitting the cumulative row per user per
batch. This is the engine's escape hatch for operator semantics the
built-in windows can't express; state lives in the state store —
bounded by #keys, not data volume — and runs unchanged under the
RocksDB provider (streaming/statestore.py;
tests/test_rocksdb_statestore.py asserts result equality vs the
default provider for this operator).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user cumulative (n, Σvalue) rows, one per
    user per batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


@register(
    "st06_stateful_user_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY user_id
    """,
    category="streaming",
    doc=(
        "custom stateful operator (applyInPandasWithState): running "
        "per-user totals; final state ≡ batch aggregate."
    ),
)
def st06_stateful_user_totals(spark, sf_dir):
    return _stateful_user_totals(spark, sf_dir)


def _stateful_user_totals(spark, sf_dir):
    from .ops import _events_stream, run_to_memory

    s = _events_stream(spark, sf_dir)
    out = run_to_memory(running_user_totals(s), "update")
    # last emission per user = cumulative total (single-batch replay emits
    # once; multi-batch replays are exercised in the pytest suite)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "st21_rocksdb_stateful_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY user_id
    """,
    category="streaming",
    doc=(
        "st06's applyInPandasWithState operator executed under the "
        "RocksDB state store provider (streaming/statestore.py; "
        "VERDICT r9 item 1 / SURVEY §7 M4) — the reference's own "
        "storage backend (src/rocksdb_storage_engine.rs:16-19) as "
        "Spark's streaming-state backend, DRIVER-verified against the "
        "same batch oracle, not just pytest-asserted: per-key state "
        "lives in native RocksDB (memtable + SST, checkpointed), so "
        "state scales with executor local disk instead of JVM heap — "
        "the 100 TB configuration. The provider must be a pure "
        "storage swap: identical hash to st06."
    ),
)
def st21_rocksdb_stateful_totals(spark, sf_dir):
    from .statestore import rocksdb_state_store

    # the stream starts AND terminates inside the scope (run_to_memory
    # awaits availableNow completion), so the provider pin applies to
    # exactly this query and the session conf is restored afterwards
    with rocksdb_state_store(spark):
        return _stateful_user_totals(spark, sf_dir)
