"""Periodic pipeline scheduling (reference ``dashboard/run_scheduler.py``).

The reference polls a JSON config every 10 s and shells out to the
pipeline on an hourly/daily/weekly cadence (``run_scheduler.py:53-93``).
Spark-native replacements, in order of preference:

1. **Streaming trigger** — a `processingTime` trigger on the bronze file
   stream IS the scheduler: each tick picks up new files exactly-once.
   :func:`scheduled_bronze` wires that.
2. **Catch-up batch** — external cron invoking
   ``Trigger.AvailableNow`` (see streaming/medallion.py) for coarse
   cadences (daily/weekly), paying zero idle cost between runs.
3. **Config hot-reload** ≙ restart-with-new-trigger:
   :func:`run_with_config` watches the config file between ticks and
   restarts the query when the interval changes — the streaming twin of
   ``schedule.clear()`` + re-register (:66-88). State/progress carry
   over through the checkpoint, so a restart loses nothing.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from ipes_data_pipeline_spark.pipeline.bronze import flatten_filings
from ipes_data_pipeline_spark.schemas import RAW_FILING_NESTED


def load_schedule(config_path: str) -> dict:
    """Read the scheduler config (``{"interval_seconds": N}``)."""
    with open(config_path) as f:
        return json.load(f)


def scheduled_bronze(
    spark: SparkSession,
    raw_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    interval_seconds: int,
):
    """Bronze ingestion on a processing-time cadence: every tick ingests
    whatever landed since the last, exactly-once via the checkpoint."""
    # the same backlog valve stream_bronze carries: after an outage the
    # first tick would otherwise ingest the ENTIRE landing dir as one
    # unbounded micro-batch
    raw = (
        spark.readStream.schema(RAW_FILING_NESTED)
        .option("maxFilesPerTrigger", 1024)
        .json(raw_dir)
    )
    return (
        flatten_filings(raw)
        .writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=f"{interval_seconds} seconds")
        .start()
    )


def run_with_config(
    spark: SparkSession,
    raw_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    config_path: str,
    poll_seconds: float = 1.0,
    max_runtime_seconds: float | None = None,
) -> int:
    """Run the scheduled ingestion, hot-reloading the interval from the
    config file (reference behavior: config change → re-register jobs).

    Restarting the query on a config change is safe: the checkpoint
    carries source progress, so no file is reprocessed or lost. Returns
    the number of restarts (for tests/observability). Bounded runs use
    ``max_runtime_seconds``; production passes None and runs forever.

    Robustness contracts (reference poll-loop semantics): a malformed,
    mid-write, or briefly-missing config file keeps the LAST-GOOD
    schedule instead of crashing the scheduler; only a change to
    ``interval_seconds`` itself restarts the query (unrelated config
    keys don't cold-restart ingestion); and a DEAD query is detected on
    every poll — its exception propagates instead of the loop sleeping
    forever while ingesting nothing.
    """
    current = load_schedule(config_path)
    query = scheduled_bronze(
        spark, raw_dir, bronze_dir, checkpoint_dir, current["interval_seconds"]
    )
    restarts = 0
    t0 = time.monotonic()
    mtime = os.path.getmtime(config_path)
    try:
        while max_runtime_seconds is None or (
            time.monotonic() - t0 < max_runtime_seconds
        ):
            time.sleep(poll_seconds)
            if not query.isActive:
                exc = query.exception()
                if exc is not None:
                    raise exc  # surface the failure, don't sleep forever
                break  # stopped cleanly from outside
            try:
                new_mtime = os.path.getmtime(config_path)
                if new_mtime == mtime:
                    continue
                mtime = new_mtime
                new = load_schedule(config_path)
                interval = int(new["interval_seconds"])
            except (OSError, ValueError, KeyError, TypeError, json.JSONDecodeError):
                continue  # keep the last-good schedule
            if interval != current["interval_seconds"]:
                current = {"interval_seconds": interval}
                query.stop()
                query = scheduled_bronze(
                    spark,
                    raw_dir,
                    bronze_dir,
                    checkpoint_dir,
                    interval,
                )
                restarts += 1
    finally:
        query.stop()
    return restarts


def main(argv: list[str] | None = None) -> int:
    """CLI twin of ``python3 dashboard/run_scheduler.py``
    (``run_scheduler.py:53-93``): scheduled ingestion with config
    hot-reload. ``--max-runtime`` bounds the run for smoke tests;
    production omits it and runs until interrupted."""
    import argparse

    from ipes_data_pipeline_spark.session import get_session

    p = argparse.ArgumentParser(description="Scheduled bronze ingestion.")
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--bronze", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", required=True,
                   help='JSON file: {"interval_seconds": N}; edits hot-reload')
    p.add_argument("--max-runtime", type=float, default=None,
                   help="seconds to run before exiting (default: forever)")
    args = p.parse_args(argv)

    spark = get_session("ipes-scheduler")
    restarts = run_with_config(
        spark,
        args.raw_dir,
        args.bronze,
        args.checkpoint,
        args.config,
        max_runtime_seconds=args.max_runtime,
    )
    print(f"restarts={restarts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
