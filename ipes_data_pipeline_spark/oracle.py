"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query in Spark and its oracle SQL in DuckDB over the
same parquet tables, canonicalizes both results (columns sorted by name,
rows sorted, floats rounded) and compares. Used by the test suite at
sf0.001 and by ``scripts/check_correctness.py`` at sf0.01 before commits.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from ipes_data_pipeline_spark.queries import TABLES, REGISTRY, load_all


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}" if abs(v) < 1e15 else repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if v is None or v != v:  # NaN/NaT
        return "NULL"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols) for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if a != b:
        # build each membership set once — inside the comprehension the
        # set literal would be reconstructed per row (O(n²) on big diffs)
        set_a, set_b = set(a), set(b)
        only_spark = [r for r in a if r not in set_b][:3]
        only_oracle = [r for r in b if r not in set_a][:3]
        problems.append(
            f"values differ; sample only-in-spark={only_spark} only-in-oracle={only_oracle}"
        )
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    load_all()
    spec = REGISTRY[name]
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    return compare(spark_pdf, oracle_pdf)
