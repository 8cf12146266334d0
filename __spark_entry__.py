"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`ipes_data_pipeline_spark.queries` — the declared query
surface of the engine (SURVEY.md §2.2 Q01–Q40 + training-data operators),
each paired with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ipes_data_pipeline_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY Q14) on sf0.001."""
    q.load_all()
    return q.REGISTRY["q14_tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
