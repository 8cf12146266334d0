"""Window-operator queries in batch mode with exact SQL oracles.

The streaming forms (watermarked, AvailableNow) are validated
behaviorally in tests/test_streaming.py against these same
transformations; here the *batch* semantics get DuckDB oracles so the
value-hash gate covers them too:

- q55: Spark ``session_window`` ≡ gaps-and-islands SQL (a new session
  starts when the gap to the previous event is >= the session gap —
  half-open windows);
- q56: sliding windows ≡ explicit window-grid expansion (each event
  belongs to size/slide consecutive windows);
- q57: IVF-shaped ANN — coarse cell assignment, probe only the query's
  cell ≡ the same cell predicate in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ipes_data_pipeline_spark.operators.similarity import ann_topk_ivf
from ipes_data_pipeline_spark.queries import register, t

_SESSION_GAP_S = 1800


def _q55_oracle() -> str:
    return f"""
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
f AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) >= {_SESSION_GAP_S}
              THEN 1 ELSE 0 END AS boundary
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT user_id, ts,
         SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS grp
  FROM f)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_SESSION_GAP_S} SECOND AS session_end,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, grp
"""


@register(
    "q55_session_window_batch",
    "streaming twin: session_window batch semantics (gaps-and-islands oracle)",
    _q55_oracle(),
)
def q55(spark, sf):
    return (
        t(spark, sf, "events")
        .groupBy(F.session_window("ts", f"{_SESSION_GAP_S} seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def _q56_oracle() -> str:
    # 1h windows sliding by 30m: every event is in exactly 2 windows;
    # window k's start = bucket(ts, 30m) - k*30m for k in {0, 1}.
    return """
WITH o AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
x AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * (INTERVAL 30 MINUTE) AS window_start
  FROM o CROSS JOIN (SELECT UNNEST([0, 1]) AS k))
SELECT window_start,
       window_start + INTERVAL 60 MINUTE AS window_end,
       COUNT(*) AS n_events
FROM x GROUP BY window_start
"""


@register(
    "q56_sliding_window_batch",
    "streaming twin: sliding window batch semantics (grid-expansion oracle)",
    _q56_oracle(),
)
def q56(spark, sf):
    return (
        t(spark, sf, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def _q57_oracle() -> str:
    cell = (
        "(CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END || "
        "CASE WHEN embedding[9] > 0 THEN '1' ELSE '0' END || "
        "CASE WHEN embedding[17] > 0 THEN '1' ELSE '0' END)"
    )
    ddot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )
    cos = (
        f"({ddot.format(a='e.embedding', b='q.q_vec')} / "
        f"(sqrt({ddot.format(a='e.embedding', b='e.embedding')}) * "
        f"sqrt({ddot.format(a='q.q_vec', b='q.q_vec')})))"
    )
    return f"""
WITH q AS (SELECT embedding AS q_vec, {cell} AS q_cell FROM embeddings WHERE vec_id = 7)
SELECT e.vec_id AS id, {cos} AS cos_sim
FROM embeddings e JOIN q ON {cell.replace("embedding", "e.embedding")} = q.q_cell
ORDER BY cos_sim DESC, id LIMIT 10
"""


@register(
    "q57_ann_ivf",
    "similarity search: IVF-shaped ANN (probe only the query's cell)",
    _q57_oracle(),
)
def q57(spark, sf):
    emb = t(spark, sf, "embeddings")
    return ann_topk_ivf(
        emb,
        "vec_id",
        "embedding",
        emb.filter(F.col("vec_id") == 7),
        probe_dims=(1, 9, 17),
        k=10,
    )


@register(
    "q93_window_surface",
    "G-family: remaining window surface (ntile/cume_dist/first/last/lead)",
    """SELECT o_orderkey,
              ntile(4) OVER w AS quartile,
              cume_dist() OVER w AS cd,
              first_value(o_totalprice) OVER w AS first_price,
              last_value(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS last_price,
              lead(o_orderkey, 1, -1) OVER w AS next_orderkey
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def q93(spark, sf):
    # The window functions q32/q33 left out. Ordering key (o_orderdate,
    # o_orderkey) is unique per partition, so every function is
    # deterministic — including last_value, whose frame is widened to the
    # full partition (the default frame stops at CURRENT ROW, making
    # last_value a no-op trap both engines share). One shuffle on
    # o_custkey serves all five functions (single Window node).
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_orderkey"),
    )


@register(
    "q96_gap_fill",
    "time-series: calendar spine + forward-fill (gap months carry last spend)",
    """WITH m AS (
         SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS month_spend
         FROM orders GROUP BY o_custkey, date_trunc('month', o_orderdate)),
       b AS (SELECT o_custkey, MIN(month) AS lo, MAX(month) AS hi FROM m GROUP BY o_custkey),
       spine AS (SELECT o_custkey,
                        unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
                 FROM b)
       SELECT s.o_custkey, s.month, m.month_spend,
              last_value(m.month_spend IGNORE NULLS) OVER (
                PARTITION BY s.o_custkey ORDER BY s.month) AS ff_spend
       FROM spine s LEFT JOIN m ON m.o_custkey = s.o_custkey AND m.month = s.month""",
)
def q96(spark, sf):
    # Regularize an irregular series: per-customer month spine from first
    # to last activity (sequence + explode — spine rows are generated
    # where the customer's data lives, no driver involvement), left join
    # actuals, forward-fill gaps with last(ignorenulls). The spine grows
    # with calendar span, not row count; the fill is one partition-local
    # ordered pass after the join's shuffle on the customer key.
    # month stays TIMESTAMP on both sides (date_trunc, not a DATE cast):
    # pandas renders an oracle DATE as midnight datetime64, so a DATE
    # output would hash-mismatch on representation alone
    m = (
        t(spark, sf, "orders")
        .groupBy("o_custkey", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("month_spend")
        )
    )
    b = m.groupBy("o_custkey").agg(F.min("month").alias("lo"), F.max("month").alias("hi"))
    spine = b.select(
        "o_custkey",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return spine.join(m, ["o_custkey", "month"], "left").select(
        "o_custkey",
        "month",
        "month_spend",
        F.last("month_spend", ignorenulls=True).over(w).alias("ff_spend"),
    )
