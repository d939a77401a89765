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


def _scala_seq(seq):
    for i in range(seq.size()):
        yield seq.apply(i)


def shuffle_exchanges(df: DataFrame) -> list[tuple[str, list[str]]]:
    """(partitioning_description, output_column_names) for every shuffle
    Exchange in the planned tree (initial plan — pre-AQE). The output list
    is the exchange's PAYLOAD: what actually crosses the wire. This is how
    the r2 'vector payloads ride the self-join shuffles' regression gets a
    permanent test — assert the bucket-keyed exchange outputs ids, not
    embeddings."""
    out: list[tuple[str, list[str]]] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls in ("ShuffleExchangeExec", "ShuffleExchangeLike"):
            part = node.outputPartitioning().toString()
            cols = [a.name() for a in _scala_seq(node.output())]
            out.append((part, cols))
        for child in _scala_seq(node.children()):
            walk(child)

    walk(df._jdf.queryExecution().executedPlan())
    return out


def assert_keyed_exchanges_exclude(df: DataFrame, key_substring: str, banned_cols: set[str]) -> None:
    """Every shuffle Exchange whose partitioning mentions `key_substring`
    (e.g. 'bucket', 'cell', 'fp') must NOT carry any of `banned_cols` in its
    payload — the slim-self-join invariant (VERDICT r2 items 2/3)."""
    found_keyed = False
    for part, cols in shuffle_exchanges(df):
        if key_substring in part:
            found_keyed = True
            riding = banned_cols.intersection(cols)
            if riding:
                raise AssertionError(
                    f"exchange keyed on '{key_substring}' carries payload "
                    f"columns {sorted(riding)} (all columns: {cols})"
                )
    if not found_keyed:
        raise AssertionError(
            f"no shuffle exchange keyed on '{key_substring}' found — the "
            "plan changed shape; update the test's expectations"
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
