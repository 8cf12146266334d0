"""Range-containment join as a bucketed equi-join.

``point ∈ [start, end)`` is an inequality predicate, and OSS Spark plans
a pure-inequality join as BroadcastNestedLoopJoin — O(|L|·|R|) work and
a mandatory broadcast of one whole side, which is exactly the plan that
cannot survive a 100 TB scan. (The reference never needs this operator —
its datasets fit one process; see SURVEY.md §2 F1 for its equi-joins —
but any time-windowed join over the events/orders scale does.)

The standard scale-out rewrite (Databricks' range-join hint, Flink's
interval join) is bucketization:

1. pick a bucket width ``w`` (ideally ≈ the typical interval length);
2. each point lands in bucket ``floor(p / w)``;
3. each interval **explodes** to every bucket it overlaps — a bounded
   blow-up of ``len/w + 1`` rows per interval;
4. equi-join on the bucket id (plus any real equi-keys), then apply the
   exact range predicate as a post-filter.

The join is then a plain shuffle hash / sort-merge join: partitionable,
AQE-skew-splittable, no nested loop anywhere. Each (point, interval)
match is produced exactly once — the point's bucket is unique, so no
dedup pass is needed. Cost knob: small ``w`` → more interval replicas;
large ``w`` → more false candidates for the post-filter. Both are linear
and local; either beats the quadratic fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__rj_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    equi_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (half-open), optionally also matching on
    ``equi_keys`` = [(point_side_col, interval_side_col), ...].

    All three range columns must be numeric (cast timestamps to epoch
    seconds first). Output columns: points' then intervals' (equi-key
    duplicates dropped from the interval side).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = equi_keys or []

    p = points.withColumn(_B, F.floor(F.col(point_col) / F.lit(bucket_width)))
    # end is exclusive, but a point equal to a bucket boundary still
    # lands in floor(end/w): include it and let the exact filter decide.
    i = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ),
    )
    cond = p[_B] == i[_B]
    for pk, ik in keys:
        cond = cond & (p[pk] == i[ik])
    joined = p.join(i, cond, "inner").where(
        (p[point_col] >= i[start_col]) & (p[point_col] < i[end_col])
    )
    drop = [p[_B], i[_B]] + [i[ik] for _, ik in keys]
    return joined.drop(*drop)
