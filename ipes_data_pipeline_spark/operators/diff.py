"""Snapshot diffing: row-level change audit between two table versions.

The governance primitive behind incremental publishing and regression
audits: given two snapshots of the same logical table, classify every
key as ``added`` / ``removed`` / ``changed`` / ``unchanged``. At 100 TB
this is ONE full-outer hash join on the key (both sides shuffle once on
the same key — co-partitioned/bucketed snapshots skip even that) plus a
null-safe column compare; nothing is collected and no state grows with
history (each diff touches exactly two snapshots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eq_all_null_safe(pairs: list[tuple[Column, Column]]) -> Column:
    """Conjunction of NULL-SAFE equality over column pairs: NULL vs
    NULL is equal, NULL vs value is not — the one definition both
    :func:`snapshot_diff` and ``upsert.scd2_merge`` compare payloads
    with (plain ``=`` would misreport both cases through three-valued
    logic)."""
    same = F.lit(True)
    for a, b in pairs:
        same = same & a.eqNullSafe(b)
    return same


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``(key_cols..., change_type)`` for every key in either snapshot.

    ``change_type`` ∈ {'added', 'removed', 'changed', 'unchanged'}:
    added = key only in ``new``, removed = only in ``old``, changed =
    in both with any compared column differing under NULL-SAFE equality
    (NULL vs NULL is unchanged; NULL vs value is a change — plain ``=``
    would misreport both). ``compare_cols`` defaults to every shared
    non-key column.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = [F.col(f"__ko_{c}").eqNullSafe(F.col(f"__kn_{c}")) for c in key_cols]
    j = o.join(n, on=cond, how="full_outer")
    same = eq_all_null_safe(
        [(F.col(f"__o_{c}"), F.col(f"__n_{c}")) for c in compare_cols]
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change_type"),
    )
