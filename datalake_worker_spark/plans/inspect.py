"""Physical-plan inspection helpers (SURVEY.md §4).

The engine has no custom planner — Catalyst/AQE is the optimizer. These
helpers make its decisions observable and assertable so tests and the
bench harness can verify the plans we want at 100 TB: filters pushed to
the scan, columns pruned, small sides broadcast, codegen engaged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            for fieldspec in inner.split(","):
                name = fieldspec.split(":")[0].strip()
                if name:
                    cols.add(name)
    return sorted(cols)


def final_plan(df: DataFrame) -> str:
    """Executed plan AFTER an action — under AQE the pre-execution plan is
    a placeholder (isFinalPlan=false); run it, then read the real one."""
    df.collect()  # count() would build a separate plan; collect executes THIS one
    return df._jdf.queryExecution().executedPlan().toString()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def shuffle_count(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")
