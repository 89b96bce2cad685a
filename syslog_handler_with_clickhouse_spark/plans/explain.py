"""Physical-plan introspection helpers.

The scale contract (SURVEY §4): filters and projections reach the parquet
scan, small dims broadcast, expressions stay inside whole-stage codegen,
and Python appears only where explicitly chosen (mapInPandas).  These
helpers make those properties assertable in tests instead of hoped-for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the formatted plan shows a parquet PushedFilters entry
    containing ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-execution operators present in the plan (should be empty for
    native pipelines; exactly the chosen ones for pandas paths)."""
    plan = formatted_plan(df)
    return [
        marker
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        if marker in plan
    ]


def read_schema_columns(df: DataFrame) -> str:
    """The ReadSchema fragment of the scan — for column-pruning asserts."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line
    return ""
