"""SparkSession factory + runtime tuning.

The driver harness owns the session it passes to ``__spark_entry__``;
``tune`` therefore only sets *runtime-settable* confs so our queries
behave deterministically (UTC timestamps, non-ANSI coercions, AQE)
regardless of who built the session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set on a live session (all runtime-settable).
_RUNTIME_CONFS = {
    # DuckDB oracle comparisons need UTC-naive timestamp semantics.
    "spark.sql.session.timeZone": "UTC",
    # Spark 4 defaults to ANSI mode (casts throw). The engine's declared
    # semantics are null-on-failure coercions (reference: pd.to_datetime
    # errors="coerce", dashboard/pages/3_..._Data_Insights.py:36).
    "spark.sql.ansi.enabled": "false",
    # Runtime re-planning: coalesce tiny shuffle partitions, rewrite
    # skewed sort-merge joins, convert SMJ->BHJ when a side is small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Partitions must scale with input bytes, not stay pinned at the
    # core count: the sf10 decade measured the wide exploded-
    # intermediate plans (shingle/band rows) going superlinear when
    # every exchange kept 32 partitions (SCALING.md round-5 A/B: q133
    # 393->201 s / 347->145 s with 256 initial partitions, q39 a wash,
    # q42f dominated by single-JVM memory noise). AQE makes a high
    # initial count free for small stages: parallelismFirst coalesces
    # them back to default parallelism, so sf0.1 plans are unchanged.
    # Streaming state-store layout is untouched (it follows
    # spark.sql.shuffle.partitions, which stays at the core count).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    # Arrow for every pandas boundary (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The testdata's events.parquet stores TIMESTAMP(NANOS); Spark's reader
    # has no nanos type — read as long and convert in the loader (the data
    # is micro-aligned, so `timestamp_micros(ts div 1000)` is lossless).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we did not necessarily create."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    # Local mode: shuffle partitions ~ cores. On a real cluster AQE
    # coalescing makes a higher initial number safe; 32 matches the
    # local[32] test substrate and is a fine AQE starting point.
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    except Exception:  # pragma: no cover
        pass
    return spark


def get_session(app_name: str = "ipes_data_pipeline_spark") -> SparkSession:
    """Build (or reuse) a local session with scale-aware defaults.

    On a real cluster the same confs apply; only master/memory change.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", cpus)
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
