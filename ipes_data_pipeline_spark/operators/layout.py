"""Multi-dimensional file layout: Z-order (Morton) clustering.

A single-column sort gives perfect file-level min/max skipping on that
column and none on any other. Interleaving the bits of several columns'
bucket ids orders rows along a space-filling curve, so every written
file covers a small HYPERCUBE of the key space — min/max footer stats
then prune files for predicates on ANY prefix-free combination of the
zorder columns. This is the compaction-time layout step lake engines
run before handing data to a scan-heavy workload; here it is three
narrow Spark ops (two tiny driver aggregates, one map expression, one
range repartition), so it composes with any writer in the repo
(`sources.io.write_sized_shards` included).

Scale shape: the min/max bounds are a 1-row aggregate; bucketization +
bit interleave are whole-stage-codegen column math; the only shuffle is
the final ``repartitionByRange`` every layout rewrite needs anyway.
Equi-width buckets keep the expression constant-size; heavily skewed
columns should be pre-transformed (log, rank) by the caller — the
docstring-level contract lake compactions use in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _morton(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each bucket id (column-major):
    result bit ``i * n_cols + j`` = bit ``i`` of column ``j``."""
    z = F.lit(0).cast("long")
    n = len(bucket_cols)
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows reordered along a Z-curve over ``cols`` (numeric), ready to
    write: each output partition (→ file) covers a compact hypercube of
    the key space, giving multi-column min/max skipping.

    ``bits`` buckets per dimension = ``2^bits``; the Morton value uses
    ``bits × len(cols)`` bits total (≤ 63 enforced).
    """
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits={bits} x {len(cols)} cols exceeds the 63-bit Morton budget"
        )
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).first()
    n_buckets = 1 << bits
    bucket_exprs = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:  # constant / all-null column
            bucket_exprs.append(F.lit(0).cast("long"))
            continue
        # equi-width bucket in [0, n_buckets - 1]
        frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
        b = F.floor(frac * n_buckets).cast("long")
        bucket_exprs.append(F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)))
    zed = df.withColumn("__z", _morton(bucket_exprs, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        zed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
