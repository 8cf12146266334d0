"""REAL watermark semantics across multiple micro-batches.

The batch≡streaming equivalence tests (test_streaming.py) deliver one
AvailableNow micro-batch, which never exercises the paths that matter
operationally at 100 TB: late-data eviction, cross-batch dedup state,
and join-state bounding. These tests feed files across ≥2 triggers
(separate AvailableNow runs sharing one checkpoint, plus
maxFilesPerTrigger=1 splits) and pin behaviors that DISAPPEAR if the
watermark is removed:

- an append-mode windowed aggregate only finalizes windows once the
  watermark passes, and a late event arriving in a later batch is
  DISCARDED (the streaming count diverges from the batch count —
  that divergence IS the eviction);
- dropDuplicatesWithinWatermark drops a duplicate arriving in a LATER
  micro-batch while the key is in state, and the state store EVICTS
  keys older than the watermark (state rows < distinct keys seen);
- stream-stream interval join state stays bounded: after the watermark
  passes a pair, its rows leave the state store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _land(spark, d, rows, name):
    """Write one parquet file of events into the stream landing dir."""
    df = spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)
    df.write.mode("append").parquet(str(d))
    return name


def _ev(eid, ts, user=1, etype="view"):
    import datetime as dt

    return (eid, dt.datetime.fromisoformat(ts), user, etype, 1.0, "{}")


def _run_wave(spark, src_fn, ckpt, out, mode="append", max_files=1):
    """One AvailableNow run against a shared checkpoint; returns the
    query's recentProgress entries (state metrics survive termination)."""
    q = (
        src_fn()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q.recentProgress


def test_append_window_finalizes_and_discards_late_event(spark, tmp_path):
    """Window [10:00,11:00) gets 2 on-time events in wave 1 and a LATE
    third in wave 2 after the watermark passed 12:30. Streaming append
    output must say 2 (late row evicted); the same aggregate over a
    batch read of the same files says 3. Remove the watermark and this
    test fails twice over: append mode without a watermark is not even
    allowed to emit, and the late row would be counted."""
    from ipes_data_pipeline_spark.streaming.windows import tumbling_counts

    src_dir = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    _land(
        spark,
        src_dir,
        [
            _ev(1, "2024-01-01T10:05:00"),
            _ev(2, "2024-01-01T10:10:00"),
            _ev(3, "2024-01-01T13:00:00"),  # advances watermark to 12:30
        ],
        "wave1",
    )

    def src():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        return tumbling_counts(stream, size="1 hour", watermark="30 minutes")

    _run_wave(spark, src, ckpt, out)
    # wave 2: a duplicate-shaped LATE event for the already-closed window
    # + one fresh event at 14:30 that pushes the watermark to 14:00 —
    # exactly the close of window [13:00,14:00), finalizing it (append
    # emits a window only once watermark ≥ window END)
    _land(
        spark,
        src_dir,
        [
            _ev(4, "2024-01-01T10:20:00"),  # ts < watermark 12:30 → dropped
            _ev(5, "2024-01-01T14:30:00"),
        ],
        "wave2",
    )
    _run_wave(spark, src, ckpt, out)

    got = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ("2024-01-01T10:00:00", 2) in got  # late event 4 NOT counted
    assert ("2024-01-01T13:00:00", 1) in got  # finalized by wave 2
    # batch over the same files counts the late row — the divergence is
    # the watermark eviction, not a data difference
    batch = tumbling_counts(spark.read.schema(EVENT_SCHEMA).parquet(str(src_dir)))
    w1 = batch.where(F.col("window_start") == "2024-01-01 10:00:00").collect()
    assert w1[0]["n_events"] == 3


def test_dedup_cross_batch_drop_and_state_eviction(spark, tmp_path):
    """q111 path (streaming/windows.py dedup_within_watermark): a
    duplicate arriving in a LATER micro-batch is dropped while its key
    is within the watermark, and keys older than the watermark leave
    the state store — the final batch's state row count must be below
    the number of distinct keys ingested. Without the watermark the
    state would hold every key forever (and the operator would not
    even be allowed to run)."""
    from ipes_data_pipeline_spark.streaming.windows import dedup_within_watermark

    src_dir = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"

    def src():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        return dedup_within_watermark(stream, watermark="30 minutes")

    _land(
        spark,
        src_dir,
        [_ev(1, "2024-01-01T12:00:00"), _ev(2, "2024-01-01T12:05:00")],
        "wave1",
    )
    _run_wave(spark, src, ckpt, out)
    # wave 2, SECOND AvailableNow run: exact duplicate of event 1 —
    # its key is in cross-run state (12:00 ≥ watermark 11:35) → dropped;
    # event 4 at 14:00 advances the watermark to 13:30, evicting keys
    # 1-3 (event time < 13:30) at batch end.
    _land(
        spark,
        src_dir,
        [
            _ev(1, "2024-01-01T12:00:00"),  # cross-batch duplicate
            _ev(3, "2024-01-01T12:10:00"),
            _ev(4, "2024-01-01T14:00:00"),
        ],
        "wave2",
    )
    progress = _run_wave(spark, src, ckpt, out)

    ids = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2, 3, 4]  # each exactly once: cross-batch dup dropped

    state = [
        p["stateOperators"][0]
        for p in progress
        if p.get("stateOperators")
    ]
    assert state, "no state operator metrics captured"
    # 4 distinct keys went through; after the final batch the watermark
    # (13:30) has evicted every key but event 4's
    assert state[-1]["numRowsTotal"] < 4
    assert any(s.get("numRowsRemoved", 0) > 0 for s in state)


def test_stream_stream_join_state_bounded_across_batches(spark, tmp_path):
    """q115 shape (view→purchase attribution, 1 h interval, both sides
    watermarked): matches are found across the run AND the state store
    sheds rows once the watermark passes them. After a batch whose
    events sit 10 h later, the first wave's join state must be gone —
    final numRowsTotal < total rows ingested. Without the watermarks
    Spark would (a) reject the append-mode interval join and (b) hold
    every row forever."""
    src_dir = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"

    def src():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("user_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        return views.join(
            purchases,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 1 hour")),
        ).select("view_id", "purchase_id", "user_id")

    _land(
        spark,
        src_dir,
        [
            _ev(1, "2024-01-01T10:00:00", user=7, etype="view"),
            _ev(2, "2024-01-01T10:30:00", user=7, etype="purchase"),
        ],
        "wave1",
    )
    # 10 h later: watermark sweeps past wave 1's rows
    _land(
        spark,
        src_dir,
        [
            _ev(3, "2024-01-01T20:00:00", user=8, etype="view"),
            _ev(4, "2024-01-01T20:15:00", user=8, etype="purchase"),
        ],
        "wave2",
    )
    progress = _run_wave(spark, src, ckpt, out)

    matches = {
        (r["view_id"], r["purchase_id"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert matches == {(1, 2), (3, 4)}

    state = [
        p["stateOperators"][0] for p in progress if p.get("stateOperators")
    ]
    assert state, "no state operator metrics captured"
    # 4 rows entered join state over the run; wave 1's must be evicted
    # once the watermark reaches 19:00
    assert state[-1]["numRowsTotal"] < 4
    assert any(s.get("numRowsRemoved", 0) > 0 for s in state)
