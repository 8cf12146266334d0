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
from pyspark.sql.window import Window as W

from ipes_data_pipeline_spark.operators.util import cut

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


def range_count(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "n_points",
) -> DataFrame:
    """Per-interval COUNT of points in ``[start, end)`` WITHOUT the pair
    join: ``count = prefix(end-1) - prefix(start-1)`` over a dense
    cumulative histogram of the point column.

    :func:`bucketed_range_join` materializes every (point, interval)
    candidate pair; when intervals are long relative to point spacing
    that is O(|points|·|intervals| / #buckets) rows — at sf0.1 the
    orders×lineitem week-window query produces ~260 M pairs just to
    count them. When the query only needs the *count* per interval (the
    common rollup case), the prefix-sum form is O(|points| + |intervals|
    + domain): one small agg, one window over the dense domain, two
    broadcast equi-joins. No pair blow-up at any scale.

    All three columns must be integer-valued with a unit-step domain
    (e.g. days since epoch). The dense histogram has one row per domain
    value between min and max point — suitable for day/hour grains
    (decades ≈ 10⁴–10⁵ rows, broadcastable); for second-grain domains
    over years, bucket to a coarser grain first or use
    :func:`bucketed_range_join`. Intervals with zero points are kept
    (count 0) — filter afterwards to mirror inner-join semantics.
    """
    # materialize the histogram once: it is referenced by three consumers
    # (bounds, and both lookup sides) and without a checkpoint Catalyst
    # re-executes the whole points scan+agg per consumer — 5 full scans
    # of the fact table instead of 1 (verified via .explain)
    per = (
        points.groupBy(F.col(point_col).cast("long").alias("__p"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .transform(cut)
    )
    bounds = per.agg(F.min("__p").alias("__lo"), F.max("__p").alias("__hi"))
    dense = (
        bounds.select(F.explode(F.sequence("__lo", "__hi")).alias("__p"))
        .join(per, "__p", "left")
        .na.fill({"__n": 0})
    )
    # single-partition window is deliberate: the dense domain is small by
    # contract (see docstring), and the result broadcasts to the probe side
    w = W.orderBy("__p").rowsBetween(W.unboundedPreceding, 0)
    prefix = dense.select(
        "__p", F.sum("__n").over(w).alias("__cum")
    ).transform(cut)

    iv = intervals.crossJoin(F.broadcast(bounds))
    # clamp both lookups into [lo-1, hi]; keys outside the histogram
    # resolve to NULL → COALESCE 0 (below min) or are clamped to the
    # total (above max), so out-of-range windows count correctly
    iv = iv.withColumn(
        "__ek", F.least(F.col(end_col).cast("long") - 1, F.col("__hi"))
    ).withColumn(
        "__sk",
        F.least(
            F.greatest(F.col(start_col).cast("long") - 1, F.col("__lo") - 1),
            F.col("__hi"),
        ),
    )
    pe = F.broadcast(prefix)
    iv = iv.join(
        pe.withColumnRenamed("__p", "__ek").withColumnRenamed("__cum", "__ce"),
        "__ek",
        "left",
    ).join(
        pe.withColumnRenamed("__p", "__sk").withColumnRenamed("__cum", "__cs"),
        "__sk",
        "left",
    )
    return iv.withColumn(
        out_col,
        F.coalesce(F.col("__ce"), F.lit(0)) - F.coalesce(F.col("__cs"), F.lit(0)),
    ).drop("__ek", "__sk", "__ce", "__cs", "__lo", "__hi")
