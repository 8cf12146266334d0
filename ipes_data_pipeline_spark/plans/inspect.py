"""Physical-plan inspection utilities.

The engine's scale posture is *plan-assertable*: the right plan for a
query is part of its contract, not an accident of the optimizer's mood.
These helpers read the formatted physical plan so tests (and operators'
own debug paths) can pin broadcast choices, pushdown, pruning, and the
absence of cartesian products. CI uses them in tests/test_plan_shapes.py;
they are also the recommended review tool after adding an operator:
iterate until the plan is the one you'd want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` output of the DataFrame's physical plan."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)


def assert_broadcast_join(df: DataFrame, forbid_smj: bool = False) -> None:
    p = formatted_plan(df)
    assert "BroadcastHashJoin" in p, f"no broadcast join in plan:\n{p}"
    if forbid_smj:
        assert "SortMergeJoin" not in p, f"unexpected sort-merge join:\n{p}"


def assert_no_cartesian(df: DataFrame) -> None:
    p = formatted_plan(df)
    assert "CartesianProduct" not in p, f"cartesian product in plan:\n{p}"


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in the scan's PushedFilters list."""
    p = formatted_plan(df)
    assert "PushedFilters: [" in p, f"no pushed filters in plan:\n{p}"
    for frag in fragments:
        assert frag in p, f"filter {frag!r} not pushed:\n{p}"


def assert_pruned_columns(
    df: DataFrame, expected: list[str], forbidden: list[str]
) -> None:
    """The scan's ReadSchema must contain `expected` and none of
    `forbidden` — i.e., column pruning reached the reader."""
    p = formatted_plan(df)
    lines = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert lines, f"no ReadSchema in plan:\n{p}"
    schema_line = lines[0]
    for c in expected:
        assert c in schema_line, f"column {c} missing from scan: {schema_line}"
    for c in forbidden:
        assert c not in schema_line, f"column {c} not pruned: {schema_line}"
