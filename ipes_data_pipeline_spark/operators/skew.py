"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join handling covers sort-merge joins automatically
(session.py enables it); these helpers cover the two cases AQE does not:

- **hot-key aggregation**: a groupBy where one key holds a large share
  of all rows bottlenecks its single reduce task. Salting splits each
  key into ``n_salts`` partial groups, aggregates, then merges — two
  small shuffles instead of one skewed one.
- **hot-key broadcast join**: replicating the small side per salt keeps
  a skewed probe side spread across tasks.

Only algebraic aggregates (sum/count/min/max) can two-phase like this;
avg = salted sum / salted count at the merge step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(cols, n_salts: int):
    """Per-row salt in [0, n_salts): pmod of a row hash mixed with the
    physical position. pmod, NOT abs(hash) % n — abs(Integer.MIN_VALUE)
    overflows negative and such rows would carry a salt no exploded
    replica matches (silently dropped from salted joins). The position
    term (partition id + monotonically_increasing_id) spreads
    byte-identical duplicate rows — the typical hot key in count
    workloads — which a pure content hash would send to ONE salt,
    rebuilding the exact bottleneck the salt exists to remove. Salts
    only route rows; every result is salt-invariant, so the
    position-dependence never reaches output values.
    """
    return F.pmod(
        F.hash(*[F.col(c) for c in cols], F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).alias("_salt")


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """groupBy(key).count() resilient to hot keys.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    ``n_salts`` tasks; phase 2 sums the (at most ``n_salts``) partials
    per key. Deterministic: the salt derives from a hash of the full
    row only for distribution, never for the result.
    """
    salt = _row_salt(df.columns, n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial_n"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial_n").alias("count")
    )


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    salt = _row_salt(df.columns, n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial_s"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial_s").alias(f"sum_{value_col}")
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on ``key`` where big has hot keys and small fits in a
    broadcast. Each big row picks a random-but-deterministic salt; the
    small side is replicated across all salts, so the hot key's rows
    join in ``n_salts`` parallel tasks instead of one.
    """
    if how not in ("inner", "left"):
        # right/full outer would return every UNMATCHED small row once
        # per salt replica (it exists in all n_salts copies and none
        # join) — n_salts duplicates instead of one row
        raise ValueError(
            f"salted_broadcast_join supports how='inner'/'left', got {how!r}"
        )
    salted_big = big.withColumn("_salt", _row_salt(big.columns, n_salts))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(
        F.broadcast(exploded_small), on=[key, "_salt"], how=how
    ).drop("_salt")
