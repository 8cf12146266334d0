"""Typed CSV/JSON layer I/O (reference A4–A6: ``json.dump``/``csv.DictWriter``
at ``code/fetch.py:310-325``, ``code/structure_data.py:333-378``,
``pd.read_csv`` at ``dashboard/pages/3_📈_Data_Insights.py:21-22``).

Rules carried over from the reference's data (SURVEY §2.3.6):

- CSV values contain quoted embedded newlines (a literal
  ``"ERRATA\\n ERRATUM OR ADDENDUM"`` submission type) → reads use
  ``multiLine`` + explicit quoting, never naive line splitting;
- schemas are ALWAYS explicit on read (inference costs a second scan
  and silently widens types between runs);
- internal layers are Parquet; CSV/JSON exist only at the edges
  (export for the reference's consumers, ingest of its bronze files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Quote-correct, schema-enforced CSV read (multiline values OK)."""
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')  # RFC-4180 doubled quotes
        .schema(schema)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Header CSV with RFC-4180 quoting (embedded newlines/commas stay
    quoted — parity with the reference's csv.DictWriter output).

    ``single_file`` coalesces to one part file for small exports; leave
    False at scale (one file per partition, written in parallel).
    """
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("quoteAll", False)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-enforced JSON-lines read; records not matching the schema
    surface as nulls (permissive mode), never abort the scan."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-enforced ORC read. Same predicate-pushdown/column-pruning
    contract as parquet (both columnar with min/max stripe stats); offered
    for lakes standardized on ORC."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").orc(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet batches whose schemas drifted (columns added over
    time) into one frame with the UNION schema; rows from batches that
    predate a column read NULL for it.

    ``mergeSchema`` reconciles the footers at planning time — at 100 TB
    this costs one footer read per file (parallelized on the driver's
    listing pool), not a data pass. Type WIDENING across batches (int →
    long) is rejected by Spark, which is the behavior we want: silent
    widening between runs is the reference quirk SURVEY §2.3.6 warns
    about — evolution here means columns appear, never change type.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_sized_shards(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    sort_within_by: list[str] | None = None,
) -> int:
    """Write parquet with BOUNDED, roughly-equal file sizes; returns the
    shard count.

    The two failure modes this controls at lake scale are both file-count
    pathologies: a shuffle-partitioned write emits |partitions| files per
    write (the small-files problem — footer/listing overhead dominates
    reads), while a coalesced write emits multi-GB files a single task
    must produce and a single reader must split. Round-robin
    `repartition(n)` with n derived from the actual row count gives
    near-equal shards; `maxRecordsPerFile` is the hard upper bound when
    the estimate is stale. `sort_within_by` sorts WITHIN each shard
    (sortWithinPartitions — no extra exchange) so min/max column stats
    stay tight for data-skipping readers.
    """
    # persist across the two actions: count() executes the full upstream
    # plan and the write would execute it AGAIN from scratch — on a
    # multi-join input that doubles the job
    df = df.persist()
    try:
        n_rows = df.count()
        n_shards = max(1, -(-n_rows // max(1, target_rows_per_file)))
        out = df.repartition(n_shards)
        if sort_within_by:
            out = out.sortWithinPartitions(*sort_within_by)
        (
            out.write.mode("overwrite")
            .option("maxRecordsPerFile", target_rows_per_file)
            .parquet(path)
        )
    finally:
        df.unpersist()
    return n_shards
