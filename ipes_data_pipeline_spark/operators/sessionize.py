"""Sessionization + as-of join — time-series composites Spark lacks as
single operators, expressed as window compositions (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Assign gap-based session ids per user (batch twin of
    ``session_window`` in streaming; see streaming/windows.py).

    session boundary ⇔ first event or gap from previous event > threshold;
    session_id = running count of boundaries (exact int cumsum). Shuffles
    once on the user key; both windows reuse that partitioning.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    epoch = F.col(ts_col).cast("double")
    prev = F.lag(epoch).over(w)
    boundary = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(boundary).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    left_id: str,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (deterministic tie-break).

    Implementation: range-filtered equi-join + per-left-row argmax window.
    The equi-join on the key keeps the shuffle bounded; for high-fanout
    keys, pre-bucketing by time or ``pd.merge_asof`` per group
    (applyInPandas) are the documented alternatives.
    """
    j = left.join(
        right,
        (F.col(left_key) == F.col(right_key)) & (F.col(right_ts) <= F.col(left_ts)),
        "inner",
    )
    w = W.partitionBy(left_id).orderBy(F.desc(right_ts), F.desc(right_tiebreak))
    return j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn"
    )
