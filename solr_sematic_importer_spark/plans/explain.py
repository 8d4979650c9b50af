"""Physical-plan introspection helpers (SURVEY §4 acceptance tooling).

The engine's scale claims are plan properties: query-term predicates must
reach the parquet/Iceberg scan (PushedFilters), projections must prune
columns (ReadSchema), relational stages must stay inside whole-stage
codegen, and the top-k must plan as TakeOrderedAndProject. These helpers
make those properties assertable in tests and inspectable in notebooks
instead of eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's scan nodes."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter
    boundaries). Parsed from the executed plan's ``*(N)`` markers — the
    formatted explain mode does not carry codegen ids. Under AQE the
    markers only appear once the plan is final: pass ``execute=True`` to
    run the query first."""
    if execute:
        df.collect()
    tree = df._jdf.queryExecution().executedPlan().treeString()
    return len(set(re.findall(r"\*\((\d+)\)", tree)))


def has_node(df: DataFrame, node: str) -> bool:
    return node in plan_string(df)


def assert_scan_pushdown(df: DataFrame, fragment: str) -> None:
    """Assert some scan in the plan pushed a predicate containing
    ``fragment`` (e.g. ``"In(term"``)."""
    got = pushed_filters(df)
    if not any(fragment in f for f in got):
        raise AssertionError(
            f"no pushed filter containing {fragment!r}; scans pushed: {got}"
        )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Assert no scan reads ``column`` (payload pruning for multimodal /
    projection pruning generally)."""
    schemas = read_schemas(df)
    hits = [s for s in schemas if column in s]
    if hits:
        raise AssertionError(f"column {column!r} read by scans: {hits}")
