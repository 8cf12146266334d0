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


def test_scd2_merge_versions_history(spark):
    """SCD-2 rules: init from first batch; changed payload closes the
    open version at the update ts and appends a new current one;
    identical payload is a no-op; unknown keys insert; closed history
    is never touched by later merges."""
    from ipes_data_pipeline_spark.operators.upsert import scd2_merge

    b1 = spark.createDataFrame(
        [(1, "bronze", 10), (2, "silver", 10)], "k long, tier string, ts long"
    )
    t1 = scd2_merge(None, b1, ["k"], "ts")
    assert {
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t1.collect()
    } == {(1, "bronze", 10, None, True), (2, "silver", 10, None, True)}

    b2 = spark.createDataFrame(
        [(1, "gold", 20), (2, "silver", 20), (3, "bronze", 20)],
        "k long, tier string, ts long",
    )
    t2 = scd2_merge(t1, b2, ["k"], "ts")
    rows = {
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t2.collect()
    }
    assert rows == {
        (1, "bronze", 10, 20, False),  # closed at the update ts
        (1, "gold", 20, None, True),  # new current version
        (2, "silver", 10, None, True),  # identical payload: no-op
        (3, "bronze", 20, None, True),  # new key
    }

    # third merge: history row for k=1 must pass through untouched
    b3 = spark.createDataFrame([(3, "gold", 30)], "k long, tier string, ts long")
    t3 = scd2_merge(t2, b3, ["k"], "ts")
    rows3 = {
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t3.collect()
    }
    assert (1, "bronze", 10, 20, False) in rows3
    assert (3, "bronze", 20, 30, False) in rows3 and (3, "gold", 30, None, True) in rows3
    assert len(rows3) == 5  # k1: hist+current, k2: current, k3: hist+current


def test_scd2_merge_carries_uncompared_payload_and_guards(spark):
    """compare_cols narrows only the CHANGE TEST: uncompared payload
    columns survive on every branch (history included); NULL update ts
    and a ts preceding the open valid_from raise at execution time
    instead of writing silent garbage."""
    import pytest

    from ipes_data_pipeline_spark.operators.upsert import scd2_merge

    b1 = spark.createDataFrame(
        [(1, "bronze", "eu", 10)], "k long, tier string, region string, ts long"
    )
    t1 = scd2_merge(None, b1, ["k"], "ts")
    # tier changes (compared); region differs too but is NOT compared —
    # it must still be carried: old value on the closed row, new value
    # on the new version
    b2 = spark.createDataFrame(
        [(1, "gold", "us", 20)], "k long, tier string, region string, ts long"
    )
    t2 = scd2_merge(t1, b2, ["k"], "ts", compare_cols=["tier"])
    rows = {
        (r["k"], r["tier"], r["region"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t2.collect()
    }
    assert rows == {
        (1, "bronze", "eu", 10, 20, False),
        (1, "gold", "us", 20, None, True),
    }
    # region-only change with compare_cols=["tier"]: no-op, and the
    # surviving current row keeps its ORIGINAL region
    b3 = spark.createDataFrame(
        [(1, "gold", "jp", 30)], "k long, tier string, region string, ts long"
    )
    t3 = scd2_merge(t2, b3, ["k"], "ts", compare_cols=["tier"])
    assert (1, "gold", "us", 20, None, True) in {
        (r["k"], r["tier"], r["region"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t3.collect()
    }
    # unknown compare column is a driver-side error
    with pytest.raises(ValueError, match="not payload columns"):
        scd2_merge(t2, b3, ["k"], "ts", compare_cols=["nope"])
    # NULL ts raises at execution time
    null_ts = spark.createDataFrame(
        [(1, "x", "eu", None)], "k long, tier string, region string, ts long"
    )
    with pytest.raises(Exception, match="must be non-null"):
        scd2_merge(t2, null_ts, ["k"], "ts").collect()
    # late-arriving ts (before the open valid_from) raises
    late = spark.createDataFrame(
        [(1, "late", "eu", 5)], "k long, tier string, region string, ts long"
    )
    with pytest.raises(Exception, match="precedes open valid_from"):
        scd2_merge(t2, late, ["k"], "ts").collect()
