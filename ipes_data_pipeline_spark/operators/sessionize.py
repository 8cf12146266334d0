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
    ``right_ts <= left_ts`` on the same key (deterministic tie-break on
    ``right_tiebreak``; left rows with no qualifying right row drop,
    matching the inner-join SQL twin).

    Implementation: the union-stream plan — interleave both sides into
    ONE key-partitioned stream ordered by (ts, side, tiebreak) with
    right rows sorting before same-timestamp left rows (``<=`` is
    inclusive), then ``last(right_struct, ignorenulls)`` over the
    running window picks each left row's latest preceding right row.
    ONE shuffle on the key and zero fan-out: a key with n left × m
    right rows costs n + m window rows, where the naive range-join +
    argmax form materializes n × m joined rows before discarding all
    but one per left row (measured 7× on q53 — and at 100 TB a hot key
    makes the fan-out quadratic, while the union stream stays linear).
    ``left_id`` is retained for API compatibility (the stream form
    doesn't need a per-left-row repartition).

    NULL timestamps reproduce the inner-``<=`` contract exactly: a
    NULL ``right_ts`` satisfies no comparison, so such right rows are
    filtered out before the union; a NULL ``left_ts`` row sorts NULLS
    FIRST ahead of every (non-NULL) right row, sees no candidate, and
    drops on the ``__best IS NOT NULL`` gate.
    """
    from pyspark.sql import types as T

    # common ordering type for the interleaved stream: numeric ts
    # columns (epoch seconds) order as double; anything else goes
    # through timestamp_ntz (naive comparison — the SQL twin's
    # `right_ts <= CAST(left_ts AS TIMESTAMP)` semantics)
    lt = left.schema[left_ts].dataType
    rt = right.schema[right_ts].dataType
    ts_type = (
        "double"
        if isinstance(lt, T.NumericType) and isinstance(rt, T.NumericType)
        else "timestamp_ntz"
    )
    # NULL-struct placeholders built from the actual schemas (not DDL
    # strings — simpleString round-trips break on names needing quoting)
    l_struct = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in left.schema.fields]
    )
    r_struct = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in right.schema.fields]
    )
    rs = right.where(F.col(right_ts).isNotNull()).select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).cast(ts_type).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        F.lit(None).cast(l_struct).alias("__l"),
    )
    ls = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).cast(ts_type).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(r_struct).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rs.unionByName(ls)
        .withColumn("__best", F.last("__r", ignorenulls=True).over(w))
        .where((F.col("__side") == 1) & F.col("__best").isNotNull())
        .select("__l.*", "__best.*")
    )
