"""Streaming window operators over the events stream.

The reference's only time-series op is a calendar-month count in pandas
(``dashboard/pages/3_📈_Data_Insights.py:63-66``, E12) and a poll-loop
scheduler (I3). The engine declares the full Structured Streaming window
family — each checked against its batch equivalent (SURVEY §2.2 Q40
rule: streaming semantics are validated behaviorally, batch≡streaming,
since DuckDB has no watermark semantics):

- tumbling / sliding windows: ``F.window(ts, size, slide)``
- watermarking for late data: ``withWatermark`` bounds state; in a
  100 TB stream unbounded window state is the #1 operational failure
- exactly-once duplicate drop: ``dropDuplicatesWithinWatermark``
- session windows: ``F.session_window`` (gap-based, the streaming twin
  of the batch sessionize operator in operators/sessionize.py)

All functions take a DataFrame that may be batch or streaming — the
transformations are identical; only the sink differs. That symmetry IS
the test: run the same function over a file stream with
``Trigger.AvailableNow`` and over a batch read, compare results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-window event counts + value sum (E12's streaming form)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", size).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sliding_counts(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", size, slide).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (streaming twin of the batch
    sessionize operator — which uses a lag/cumsum window instead)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "user_id",
        "n_events",
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-style duplicate drop for at-least-once sources.

    Streaming: state is bounded by the watermark (late duplicates beyond
    it are already emitted — the at-least-once contract). Batch: plain
    dropDuplicates, the infinite-watermark limit of the same semantics.
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
