"""Skew-salting helpers and the processing-time scheduler (I3)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.skew import (
    salted_broadcast_join,
    salted_count,
    salted_sum,
)
from ipes_data_pipeline_spark.streaming.scheduler import scheduled_bronze
from tests.fixtures import RAW_FILINGS


def _skewed(spark):
    # one hot key (90%) + a tail
    hot = spark.range(900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("t"), F.col("id") % 10).alias("k"),
        F.lit(1.0).alias("v"),
    )
    return hot.unionAll(tail)


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"]).collect()}
    assert salted == plain
    assert salted["HOT"] == 900


def test_salted_sum_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {r["k"]: r["sum_v"] for r in salted_sum(df, ["k"], "v").collect()}
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim"), ("t1", "tail-dim")], "k string, attr string"
    )
    plain = big.join(small, "k").groupBy("k", "attr").count()
    salted = salted_broadcast_join(big, small, "k").groupBy("k", "attr").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_scheduled_bronze_ticks(spark, tmp_path):
    """processingTime trigger ingests files as they land, exactly-once."""
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    bronze_dir = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    def land(records, name):
        with open(raw_dir / name, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    land(RAW_FILINGS[:5], "w1.jsonl")
    q = scheduled_bronze(spark, str(raw_dir), bronze_dir, ckpt, interval_seconds=1)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(bronze_dir).count() == 5:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert spark.read.parquet(bronze_dir).count() == 5

        # second wave lands while the query keeps running: next tick
        # ingests ONLY the new file
        land(RAW_FILINGS[5:8], "w2.jsonl")
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.read.parquet(bronze_dir).count() == 8:
                break
            time.sleep(0.5)
        assert spark.read.parquet(bronze_dir).count() == 8
    finally:
        q.stop()
