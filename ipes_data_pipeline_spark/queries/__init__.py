"""Declared query surface: every operator family from SURVEY.md §2.

Each query is registered as a :class:`QuerySpec` with

- ``spark``  — ``(SparkSession, sf_dir) -> DataFrame`` (idiomatic DataFrame
  API; Catalyst owns the physical plan), and
- ``oracle`` — the equivalent ANSI SQL DuckDB runs on the same parquet
  tables (``None`` for ops SQL cannot express; the driver then records a
  rows-only check).

Cross-engine determinism rules (SURVEY.md §2.2):

- double aggregates go through ``DECIMAL(18,6)`` (exact arithmetic,
  identical in both engines) and are cast back to double — see
  :func:`dsum` / :data:`SQL_DSUM`; raw column pass-throughs are safe
  because both engines read the same parquet bits;
- timestamps are session-UTC (``tune``), matching DuckDB's naive UTC;
- every computed column is aliased identically on both sides (the
  driver's comparator sorts columns by name before hashing);
- no nondeterministic functions; ties in top-k/mode are broken by an
  explicit deterministic key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    family: str  # SURVEY.md §2 operator family this query declares


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, family: str, oracle: str | None):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, spark=wrapped, oracle=oracle, family=family)
        return wrapped

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan; pushdown-friendly).

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark reads as a
    nanos long (``nanosAsLong`` conf, see session.py); the data is
    micro-aligned so converting to a micros timestamp is lossless and
    matches DuckDB's ``CAST(ts AS TIMESTAMP)``.

    No blanket repartition here: joins/aggs parallelize at their own
    exchange, and an extra round-robin shuffle before them measurably
    hurts. CPU-heavy per-row operators (minhash/simhash/features) call
    :func:`~ipes_data_pipeline_spark.operators.util.spread` themselves.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Testdata generations have stored ts as TIMESTAMP(NANOS) (read as
        # a nanos long under nanosAsLong) or TIMESTAMP(MICROS) without UTC
        # adjustment (read as TIMESTAMP_NTZ). Normalize both to session-tz
        # TIMESTAMP — the session is pinned UTC (session.py), so the NTZ
        # cast is wall-clock-identity and matches DuckDB's naive reading.
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# --- deterministic double aggregation helpers -------------------------------
def dec(c, scale: int = 6):
    """Column cast to exact decimal — identical rounding in Spark/DuckDB."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def dsum(c, alias: str):
    """Exact decimal sum of a double column, emitted as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c, alias: str):
    """Deterministic average: exact decimal sum, double division by count."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}))"


def load_all() -> None:
    """Import all query modules so REGISTRY is fully populated."""
    from ipes_data_pipeline_spark.queries import (  # noqa: F401
        curation,
        dataops,
        extras,
        mixing,
        prep,
        relational,
        retrieval,
        tpch_shapes,
        windows_batch,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
