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
