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


def global_window_violations(df: DataFrame) -> list[str]:
    """WindowExec nodes with an EMPTY partition spec whose input is not
    already reduced — the one window shape that cannot scale (a global
    window serializes ALL input rows through one task).

    A global window is fine over a bounded table: below it, every path
    to a leaf must pass through a reducing node (an Aggregate, a
    TakeOrderedAndProject, or a Limit) before reaching the scan. A
    global window directly over raw fact rows has such a path and is
    flagged. Returns the offending nodes' simpleStrings (empty = clean).

    Walks the pre-AQE physical plan via the JVM handles — the partition
    spec is read off ``WindowExec.partitionSpec()`` itself, not parsed
    from explain text.
    """
    BOUNDED = ("Aggregate", "TakeOrderedAndProject", "Limit")

    def children(n):
        s = n.children()
        return [s.apply(i) for i in range(s.size())]

    def bounded(n) -> bool:
        name = n.getClass().getSimpleName()
        if any(b in name for b in BOUNDED):
            return True
        ch = children(n)
        if not ch:
            return False  # reached a leaf with no reduction on the path
        return all(bounded(c) for c in ch)

    violations: list[str] = []

    def walk(n):
        name = n.getClass().getSimpleName()
        if name == "WindowExec" and n.partitionSpec().isEmpty():
            if not all(bounded(c) for c in children(n)):
                violations.append(str(n.simpleString(120)))
        for c in children(n):
            walk(c)

    walk(df._jdf.queryExecution().sparkPlan())
    return violations


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
