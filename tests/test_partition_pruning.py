"""Partition pruning: date-partitioned lake layout drops files before
tasks launch (SCALING.md 'Scans': at 100 TB the partition column — not
the row-level filter — is what bounds a scan's I/O).

Writes events partitioned by calendar day, then asserts a
day-filtered query carries the predicate as a PartitionFilter (no
row-group even opened for other days) and that partition counts
match the unpartitioned answer exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.plans import formatted_plan
from ipes_data_pipeline_spark.queries import t
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_day"))
    ev = t(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    return path


def test_day_filter_becomes_partition_filter(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).where(F.col("day") == "2024-01-15")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the day predicate must live in PartitionFilters, not a row Filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line


def test_pruned_scan_matches_unpartitioned_answer(spark, partitioned_events):
    ev = t(spark, SF_SMOKE, "events")
    expect = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-15").count()
    got = (
        spark.read.parquet(partitioned_events)
        .where(F.col("day") == "2024-01-15")
        .count()
    )
    assert expect == got and got > 0


def test_headline_agg_reads_only_pruned_partitions(spark, tmp_path):
    """q20-shaped time-bucket aggregation over the date-partitioned lake
    layout, with a behavioral proof that pruning is FILE-level: a
    corrupt parquet file is planted in a non-selected day partition.
    If the day filter prunes before tasks launch, the query never opens
    that file and succeeds; a scan without the filter must fail on it
    (VERDICT r2 item 8: pruned < total, asserted by construction)."""
    path = str(tmp_path / "events_by_day_poisoned")
    ev = t(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    import os

    day_dirs = sorted(d for d in os.listdir(path) if d.startswith("day="))
    days = ["2024-01-15", "2024-01-16"]
    poison_dir = next(
        d for d in day_dirs if d.split("=")[1] not in days
    )
    with open(os.path.join(path, poison_dir, "part-99999-poison.snappy.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    assert len(day_dirs) > len(days)  # the layout has partitions to prune

    df = (
        spark.read.parquet(path)
        .where(F.col("day").isin(days))
        # the partition column comes back DATE-typed (inferred from the
        # directory names); normalize for the comparison below
        .groupBy(F.col("day").cast("string").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {tuple(r) for r in df.collect()}  # succeeds: poison never opened

    want = {
        tuple(r)
        for r in ev.where(F.col("day").isin(days))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got

    with pytest.raises(Exception):  # unpruned scan must hit the poison
        spark.read.parquet(path).groupBy("event_type").count().collect()
