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

from ipes_data_pipeline_spark.operators.util import cut


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

    - unknown key → inserted as the current version ``[ts, NULL)``;
    - known key whose COMPARED payload changed (null-safe) → the open
      version closes at ``ts`` (``valid_to = ts``, ``is_current =
      false``) and a new current version is appended;
    - known key with identical compared payload → no-op (no empty
      versions);
    - closed history rows pass through COMPLETELY untouched — every
      payload column survives, whether compared or not.

    ``compare_cols`` narrows only the CHANGE TEST (default: every
    non-key, non-ts update column); ALL payload columns are always
    carried, with the update's values winning on a new version.
    Contracts enforced at execution time (``raise_error``, no extra
    job): ``ts_col`` must be non-null, and an update's ts must not
    precede the open version's ``valid_from`` (a late-arriving batch
    would otherwise write inverted/overlapping intervals silently).
    ``updates`` must have one row per key (dedupe upstream — "latest
    per key" needs the caller's ordering rule).

    Scale shape: ONE key-keyed full-outer join of the CURRENT slice
    against the batch (history is union-passthrough, never joined);
    the per-row verdict fans out through a single array+explode, so
    the join executes once — cost scales with |current| + |batch|,
    not history depth. The physical write composes with
    :func:`upsert_partitioned`'s dynamic-partition pattern.
    """
    from ipes_data_pipeline_spark.operators.diff import eq_all_null_safe

    payload_cols = [
        c for c in updates.columns if c not in set(key_cols) | {ts_col}
    ]
    if compare_cols is None:
        compare_cols = payload_cols
    bad = set(compare_cols) - set(payload_cols)
    if bad:
        raise ValueError(
            f"compare_cols {sorted(bad)} are not payload columns of the "
            f"update batch (payload = {payload_cols})"
        )
    out_cols = [*key_cols, *payload_cols, "valid_from", "valid_to", "is_current"]
    ts_type = updates.schema[ts_col].dataType
    checked_ts = F.when(
        F.col(ts_col).isNotNull(), F.col(ts_col)
    ).otherwise(
        F.raise_error(F.lit(f"scd2_merge: {ts_col} must be non-null"))
        .cast(ts_type)
    )
    if existing is None:
        return updates.select(
            *key_cols,
            *payload_cols,
            checked_ts.alias("valid_from"),
            F.lit(None).cast(ts_type).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    cur = existing.where(F.col("is_current"))
    hist = existing.where(~F.col("is_current"))
    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in payload_cols],
        checked_ts.alias("__u_ts"),
        F.lit(True).alias("__in_upd"),  # presence marker: NOT a data col
    )
    cond = [F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in key_cols]
    j = cur.join(u, on=cond, how="full_outer")
    same = eq_all_null_safe(
        [(F.col(c), F.col(f"__u_{c}")) for c in compare_cols]
    )
    has_cur = F.col("is_current").isNotNull()
    has_upd = F.col("__in_upd").isNotNull()
    # the update's ts must not precede the version it closes
    close_ts = F.when(
        F.col("__u_ts") >= F.col("valid_from"), F.col("__u_ts")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("scd2_merge: update ts precedes open valid_from for key "),
                F.concat_ws(",", *[F.col(f"__u_{c}").cast("string") for c in key_cols]),
            )
        ).cast(ts_type)
    )

    def vrow(keys, payload, vf, vt, cur_flag):
        return F.struct(
            *[k.alias(c) for c, k in zip(key_cols, keys)],
            *[p.alias(c) for c, p in zip(payload_cols, payload)],
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            cur_flag.alias("is_current"),
        )

    cur_row = vrow(
        [F.col(c) for c in key_cols],
        [F.col(c) for c in payload_cols],
        F.col("valid_from"),
        F.col("valid_to"),
        F.lit(True),
    )
    closed_row = vrow(
        [F.col(c) for c in key_cols],
        [F.col(c) for c in payload_cols],
        F.col("valid_from"),
        close_ts,
        F.lit(False),
    )
    new_row = vrow(
        [F.coalesce(F.col(f"__u_{c}"), F.col(c)) for c in key_cols],
        [F.col(f"__u_{c}") for c in payload_cols],
        F.col("__u_ts"),
        F.lit(None).cast(ts_type),
        F.lit(True),
    )
    fanout = (
        F.when(has_cur & (~has_upd | same), F.array(cur_row))
        .when(has_cur & has_upd & ~same, F.array(closed_row, new_row))
        .otherwise(F.array(new_row))  # update-only side: insert
    )
    merged = j.select(F.explode(fanout).alias("__v")).select("__v.*")
    return hist.select(*out_cols).unionByName(merged.select(*out_cols))


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
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(target_path)
        have_table = True
    except AnalysisException as e:
        # ONLY path-not-found means "first use". A transient read failure
        # (storage throttling, momentary FS error) must propagate: treating
        # it as an empty table would dynamic-overwrite the touched
        # partitions with just the batch rows — silent data loss.
        cond = getattr(e, "getCondition", e.getErrorClass)() or ""
        if "PATH_NOT_FOUND" not in cond + str(e):
            raise
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
        merged = merged.transform(cut)
    else:
        merged = updates

    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
