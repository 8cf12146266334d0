"""Partition-scoped SCD-1 upsert into a parquet table (no Delta/Iceberg).

The reference mutates its enrichment cache by read-modify-rewrite of one
JSON file (``code/enrich_data.py:200-207``); the lake-scale analogue is
merge-on-key into a partitioned table. Without a table format providing
MERGE, the scalable pattern is dynamic partition overwrite scoped to the
partitions the delta actually touches:

1. prune the existing table to the affected partitions (partition
   pruning removes every other file before tasks launch);
2. anti-join out the rows being replaced;
3. union the updates and rewrite ONLY those partitions
   (``partitionOverwriteMode=dynamic``).

Cost scales with the touched partitions, not the table. The rewrite is
not atomic across partitions (that is exactly what Delta/Iceberg add);
each partition swap is atomic at the directory level, and the operation
is idempotent — re-running the same upsert converges to the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Merge ``updates`` into the parquet table at ``target_path``.

    Rows matching on ``key_cols`` are replaced (SCD type 1), new keys are
    inserted; partitions not present in ``updates`` are untouched (their
    files are neither read nor rewritten). Creates the table on first use.

    ``updates`` must contain ``partition_col``; a key's partition value
    is assumed stable (a key that MOVES partitions would need its old
    partition in the affected set — that variant reads old locations from
    a key→partition index, out of scope here).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        existing = spark.read.parquet(target_path)
        have_table = True
    except Exception:
        have_table = False

    if have_table:
        affected = updates.select(partition_col).distinct()
        # left-semi on the partition column: Catalyst turns this into
        # partition pruning via dynamic partition pruning / broadcast —
        # untouched partitions' files never launch tasks
        kept = (
            existing.join(F.broadcast(affected), partition_col, "left_semi")
            .join(updates.select(*key_cols), key_cols, "left_anti")
        )
        merged = kept.unionByName(updates)
        # break the self-read lineage: the plan both reads and overwrites
        # target_path, which Spark's overwrite check (rightly) rejects;
        # materializing first makes the swap read-free. At very large
        # affected sets, stage to a sibling path instead.
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = updates

    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
