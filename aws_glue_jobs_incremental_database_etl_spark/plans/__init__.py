"""Physical-plan inspection helpers — the ".explain and iterate" loop.

Used by tests and the bench harness to ASSERT plan properties instead
of hoping for them: filters pushed to the scan, projections pruned,
dimension joins broadcast, no Python UDF in a hot path.  At 100 TB a
plan regression (lost pushdown, accidental BNLJ, fact-side shuffle of
a broadcastable dim) costs more than any kernel micro-optimization —
so plan shape is part of the test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan node advertises PushedFilters containing each
    fragment (parquet/JDBC predicate pushdown actually happened)."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan:
        raise AssertionError(f"no PushedFilters in plan:\n{plan}")
    for f in fragments:
        if f not in plan:
            raise AssertionError(f"filter {f!r} not pushed; plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    if "BroadcastHashJoin" not in formatted_plan(df):
        raise AssertionError(
            f"expected a BroadcastHashJoin; plan:\n{formatted_plan(df)}"
        )


def assert_no_python_udf(df: DataFrame) -> None:
    plan = formatted_plan(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        if bad in plan:
            raise AssertionError(f"Python UDF in hot path ({bad}); plan:\n{plan}")


def read_schema_of_scan(df: DataFrame) -> str:
    """The ReadSchema fragment — verifies column pruning reached the scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""
