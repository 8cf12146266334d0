"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY if the input is under-parallel.

    CPU-heavy per-row stages (minhash signatures, simhash bits, rolling
    hashes) inherit the scan's partitioning; a small parquet file can be
    a single row-group → a single task hogging one core while 31 idle.
    At real scale the input already has ≥ parallelism partitions and this
    is a no-op — so the shuffle cost is only ever paid when it buys
    actual parallelism on small inputs.
    """
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
