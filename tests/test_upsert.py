"""Partition-scoped SCD-1 upsert (operators/upsert.py): replaced keys,
inserted keys, untouched partitions byte-identical (files not rewritten)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row

from ipes_data_pipeline_spark.operators.upsert import upsert_partitioned


def _rows(spark, path):
    return {
        (r["k"], r["part"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_partitioned(spark, tmp_path):
    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [
            Row(k=1, part="a", v="old1"),
            Row(k=2, part="a", v="old2"),
            Row(k=3, part="b", v="old3"),
        ]
    )
    upsert_partitioned(spark, target, base, ["k"], "part")
    assert _rows(spark, target) == {
        (1, "a"): "old1",
        (2, "a"): "old2",
        (3, "b"): "old3",
    }
    b_files_before = sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(os.path.join(target, "part=b", "*.parquet"))
    )

    updates = spark.createDataFrame(
        [
            Row(k=2, part="a", v="new2"),   # replace existing key
            Row(k=4, part="a", v="new4"),   # insert new key
        ]
    )
    upsert_partitioned(spark, target, updates, ["k"], "part")

    assert _rows(spark, target) == {
        (1, "a"): "old1",      # untouched key in touched partition survives
        (2, "a"): "new2",      # replaced
        (3, "b"): "old3",      # untouched partition survives
        (4, "a"): "new4",      # inserted
    }
    # the untouched partition's files were neither rewritten nor removed
    b_files_after = sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(os.path.join(target, "part=b", "*.parquet"))
    )
    assert b_files_after == b_files_before

    # idempotence: re-running the same upsert converges
    upsert_partitioned(spark, target, updates, ["k"], "part")
    assert _rows(spark, target)[(2, "a")] == "new2"
