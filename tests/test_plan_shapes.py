"""Physical-plan assertions (SURVEY §5.2 t1): the plans we *want*, not
just plans that pass — broadcast for dims, pushdown/pruning reaching the
parquet scan, TakeOrderedAndProject for top-k, codegen in the hot path."""

from __future__ import annotations

import pytest

from ipes_data_pipeline_spark.queries import REGISTRY, load_all

load_all()


def plan(spark, name, sf_dir) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_join_broadcasts(spark, sf_dir):
    # part is a dim: the join must be broadcast-hash, not sort-merge
    p = plan(spark, "q24_broadcast_join", sf_dir)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_star_join_broadcasts_small_dims(spark, sf_dir):
    # 6-way star: nation/region/supplier sides must broadcast
    p = plan(spark, "q25_star_join", sf_dir)
    assert "BroadcastHashJoin" in p


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan(spark, "q03_filter_range", sf_dir)
    assert "PushedFilters: [" in p
    # the range predicate lands in the scan, not just a post-filter
    assert "IsNotNull(l_shipdate)" in p or "GreaterThanOrEqual(l_shipdate" in p


def test_column_pruning(spark, sf_dir):
    p = plan(spark, "q01_scan_project", sf_dir)
    m = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert m, p
    schema_line = m[0]
    # only the 3 projected columns are read — a fat read would list more
    assert "l_orderkey" in schema_line and "l_quantity" in schema_line
    assert "l_comment" not in schema_line and "l_shipdate" not in schema_line


def test_topk_is_take_ordered(spark, sf_dir):
    p = plan(spark, "q37_global_topk", sf_dir)
    assert "TakeOrderedAndProject" in p


def test_agg_partial_before_exchange(spark, sf_dir):
    # map-side combine: partial aggregation must run before the shuffle
    # (codegen markers only appear on the finalized AQE plan, so assert
    # the aggregate shape instead)
    p = plan(spark, "q14_tpch_q1", sf_dir)
    assert "HashAggregate" in p
    assert "partial_sum" in p
    # partial agg appears upstream of the final-agg exchange
    assert p.index("partial_sum") > p.index("HashAggregate")


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plan(spark, "q27_semi_join", sf_dir)
    assert "LeftAnti" in plan(spark, "q28_anti_join", sf_dir)


def test_no_cartesian_products(spark, sf_dir):
    # blocked similarity ops must never plan a cartesian product
    for name in (
        "q42_dedup_minhash_lsh",
        "q44_dedup_ngram_jaccard",
        "q45_embedding_neardup_lsh",
        "q39_fuzzy_dedup",
    ):
        p = plan(spark, name, sf_dir)
        assert "CartesianProduct" not in p, name
