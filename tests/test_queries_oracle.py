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
