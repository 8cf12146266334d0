"""StreamingQueryListener telemetry: progress capture + parquet history."""

from __future__ import annotations

import json
import time

from ipes_data_pipeline_spark.streaming.medallion import stream_bronze
from ipes_data_pipeline_spark.streaming.telemetry import ProgressCapture
from tests.fixtures import RAW_FILINGS


def test_progress_capture(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    with open(raw_dir / "w1.jsonl", "w") as f:
        for r in RAW_FILINGS:
            f.write(json.dumps(r) + "\n")

    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        q = stream_bronze(
            spark, str(raw_dir), str(tmp_path / "bronze"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(300)
        # listener callbacks are async: wait briefly for delivery
        deadline = time.time() + 30
        while time.time() < deadline and not (cap.events and cap.terminated):
            time.sleep(0.5)
        assert cap.started
        assert cap.terminated
        assert sum(e["num_input_rows"] for e in cap.events) == len(RAW_FILINGS)

        hist_dir = str(tmp_path / "history")
        n_events = len(cap.events)
        cap.flush_history(spark, hist_dir)
        hist = spark.read.parquet(hist_dir)
        assert hist.count() == n_events
        assert hist.groupBy().sum("num_input_rows").collect()[0][0] == len(
            RAW_FILINGS
        )
        # flush DRAINS: the buffer is empty and a repeat flush appends
        # nothing — periodic flushing must not duplicate history rows
        assert cap.events == []
        cap.flush_history(spark, hist_dir)
        assert spark.read.parquet(hist_dir).count() == n_events
    finally:
        spark.streams.removeListener(cap)
