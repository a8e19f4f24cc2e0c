"""Physical-plan inspection helpers.

The engine's scale story rests on plan properties — broadcast (not
sort-merge) joins against small dims, column pruning and predicate pushdown
reaching the parquet scan, whole-stage codegen on the hot expressions. These
helpers make those properties *testable* (tests/test_plans.py) so a
refactor that silently degrades a plan fails CI, instead of surfacing as a
10x regression at the next scale-up (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema fragments of every file scan in the plan (column pruning
    evidence: a scan listing columns the query never uses is a bug)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if "ReadSchema:" in line
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters fragments of every file scan (predicate pushdown)."""
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if "PushedFilters:" in line
    ]
