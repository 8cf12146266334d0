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


def scd2_merge(
    existing: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """SCD type-2 merge: history-keeping dimension maintenance.

    ``existing`` is the versioned table — payload columns plus
    ``valid_from`` / ``valid_to`` / ``is_current`` (pass ``None`` to
    initialize from the first batch). ``updates`` carries the key,
    payload, and ``ts_col`` (the new version's effective-from). Rules:

    - unknown key → inserted as the current version
      ``[ts, NULL)``;
    - known key whose compared payload CHANGED (null-safe) → the open
      version closes at ``ts`` (``valid_to = ts``, ``is_current =
      false``) and a new current version is appended;
    - known key with identical payload → no-op (no empty versions);
    - closed history rows are never touched.

    ``compare_cols`` defaults to every update column that is neither a
    key nor ``ts_col``. ``updates`` must have one row per key (dedupe
    upstream — "latest per key" needs the caller's ordering rule).

    Scale shape: one key-keyed join of the CURRENT slice against the
    batch (current is a fraction of the versioned table; history is
    union-passthrough, never joined), then a union — cost scales with
    |current| + |batch|, not with history depth. The physical write
    composes with :func:`upsert_partitioned`'s dynamic-partition
    pattern.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in updates.columns if c not in set(key_cols) | {ts_col}
        ]
    out_cols = [*key_cols, *compare_cols, "valid_from", "valid_to", "is_current"]
    fresh = updates.select(
        *key_cols,
        *compare_cols,
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(updates.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if existing is None:
        return fresh.select(*out_cols)
    cur = existing.where(F.col("is_current"))
    hist = existing.where(~F.col("is_current"))
    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in compare_cols],
        F.col(ts_col).alias("__u_ts"),
    )
    cond = [F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in key_cols]
    j = cur.join(u, on=cond, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_cur = F.col("is_current").isNotNull()
    has_upd = F.col("__u_ts").isNotNull()
    # current rows that survive unchanged (no update, or identical payload)
    keep_cur = j.where(has_cur & (~has_upd | same)).select(*out_cols)
    # current rows closed by a differing update
    closed = (
        j.where(has_cur & has_upd & ~same)
        .select(
            *key_cols,
            *compare_cols,
            "valid_from",
            F.col("__u_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # new versions: unknown key, or differing payload
    opened = (
        j.where(has_upd & (~has_cur | ~same))
        .select(
            *[F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c) for c in key_cols],
            *[F.col(f"__u_{c}").alias(c) for c in compare_cols],
            F.col("__u_ts").alias("valid_from"),
            F.lit(None).cast(updates.schema[ts_col].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        hist.select(*out_cols)
        .unionByName(keep_cur)
        .unionByName(closed)
        .unionByName(opened)
    )


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
