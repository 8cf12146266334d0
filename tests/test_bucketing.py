"""Bucketed co-located joins: pre-bucketing fact tables on the join key
removes the per-query shuffle entirely (SCALING.md 'Joins').

Both sides written with ``bucketBy(N, key)`` + ``sortBy`` → the join
plan has NO Exchange on either side (SortMergeJoin reads bucket files
directly). This is the 100 TB lever for repeated fact-fact joins; the
test pins the plan shape Spark produces for it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.plans import formatted_plan
from ipes_data_pipeline_spark.queries import t
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # tables land in the session's default warehouse (spark-warehouse/,
    # gitignored); DROP TABLE removes the managed files afterwards
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        t(spark, SF_SMOKE, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        t(spark, SF_SMOKE, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            lineitem_b, orders_b.o_orderkey == lineitem_b.l_orderkey
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        p = formatted_plan(joined)
        assert "SortMergeJoin" in p
        # the join inputs read bucket files directly — no Exchange below
        # the join (only the final aggregation exchanges)
        assert "Exchange hashpartitioning(o_orderkey" not in p
        assert "Exchange hashpartitioning(l_orderkey" not in p
        assert "SelectedBucketsCount" in p  # scans are bucket-pruned readers
        # results identical to the unbucketed join
        plain = (
            t(spark, SF_SMOKE, "orders")
            .join(
                t(spark, SF_SMOKE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
