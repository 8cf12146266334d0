"""Every registered query matches its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01); the
smoke scale keeps the suite fast.
"""

from __future__ import annotations

import pytest

from ipes_data_pipeline_spark.oracle import check_query
from ipes_data_pipeline_spark.queries import REGISTRY, load_all

load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_bucketed_range_join_with_equi_keys(spark):
    """Operator unit: equi-key + range predicate, match produced once."""
    from ipes_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 25.0, 2), ("b", 5.0, 3)], "k string, ts double, pid int"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0, "w1"), ("a", 20.0, 30.0, "w2"), ("b", 100.0, 110.0, "w3")],
        "ik string, s double, e double, wid string",
    )
    out = bucketed_range_join(
        points, intervals, "ts", "s", "e", bucket_width=3.0, equi_keys=[("k", "ik")]
    )
    got = {(r["pid"], r["wid"]) for r in out.collect()}
    assert got == {(1, "w1"), (2, "w2")}
    assert out.count() == 2  # exactly-once per match, no bucket dups
