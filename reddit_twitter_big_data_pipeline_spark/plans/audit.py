"""Physical-plan assertions — lock the scale posture into tests.

A query that is correct at sf0.01 but plans a cartesian product or an
unexpected shuffle is a 100-TB incident waiting; these helpers let a test
fail the moment a code change regresses the PLAN, not just the answer.
Used by the test suite (e.g. the bucketed-join zero-shuffle test) and
handy interactively: `audit.summarize(df)` prints the operator counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_operator(df: DataFrame, operator: str) -> int:
    """Occurrences of a physical operator (e.g. 'Exchange', 'CartesianProduct',
    'BroadcastHashJoin', 'SortMergeJoin') in the executed plan. Token-boundary
    matched, so 'Exchange' does NOT count BroadcastExchange/ReusedExchange,
    'Sort' does not count SortMergeJoin, 'Filter' does not count
    PushedFilters, 'HashAggregate' does not count ObjectHashAggregate."""
    return _count(_physical_plan(df), operator)


def _count(plan: str, operator: str) -> int:
    return len(re.findall(rf"(?<![A-Za-z]){re.escape(operator)}(?![A-Za-z])", plan))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = _physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"plan contains {bad}:\n{plan}")


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """Exchanges in the final plan ≤ n (AQE may still coalesce at runtime;
    this bounds what the optimizer planned)."""
    got = count_operator(df, "Exchange")
    if got > n:
        raise AssertionError(
            f"plan has {got} exchanges (allowed {n}):\n{_physical_plan(df)}"
        )


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> None:
    got = count_operator(df, "BroadcastHashJoin")
    if got < at_least:
        raise AssertionError(
            f"expected ≥{at_least} broadcast joins, found {got}:\n{_physical_plan(df)}"
        )


def summarize(df: DataFrame) -> dict[str, int]:
    """Operator histogram of the executed plan (for interactive tuning)."""
    plan = _physical_plan(df)
    ops = (
        "Exchange",
        "BroadcastExchange",
        "ReusedExchange",
        "BroadcastHashJoin",
        "SortMergeJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "HashAggregate",
        "Sort",
        "WholeStageCodegen",
        "Filter",
        "Project",
    )
    return {op: _count(plan, op) for op in ops}
