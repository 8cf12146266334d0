"""Additional declared operator families: cube/grouping-sets, exact
percentiles, decimal-exact correlation, string/array function surfaces,
pivot, and the SQL entry point (correlated subqueries through
``spark.sql`` — the engine's query language IS Spark SQL, so part of
the declared surface runs as SQL text, not DataFrame calls).

Determinism rules as in queries/__init__: exact arithmetic through
decimals where float summation order could differ between engines;
every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.queries import dsum, register, sql_dsum, t

# --------------------------------------------------------------- cube


@register(
    "q58_cube",
    "E-family: CUBE over two dims (all grouping sets)",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def q58(spark, sf):
    return (
        t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------- percentile


@register(
    "q59_percentile_exact",
    "E-family: exact percentiles (linear interpolation, per group)",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.5) AS p50_qty,
              quantile_cont(l_extendedprice, 0.9) AS p90_price
       FROM lineitem GROUP BY l_returnflag""",
)
def q59(spark, sf):
    # Spark `percentile` = exact linear interpolation ≡ DuckDB
    # quantile_cont (both sort within the group; no approximation).
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
    )


# --------------------------------------------------------------- correlation


@register(
    "q60_corr_decimal",
    "E-family: Pearson correlation via decimal-exact co-moments",
    """WITH s AS (
         SELECT COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS syy
         FROM lineitem)
       SELECT round((n * sxy - sx * sy) /
              (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
       FROM s""",
)
def q60(spark, sf):
    # corr() itself folds doubles in partition order (engine-dependent).
    # Determinism here: the per-row double product is IEEE-identical in
    # both engines, the decimal cast rounds it identically, and the
    # decimal sum is exact — so the co-moments are bit-stable without
    # needing (overflow-prone) decimal×decimal multiplication.
    li = t(spark, sf, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((q * p).cast("decimal(28,8)")).cast("double").alias("sxy"),
        F.sum((q * q).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(28,8)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price")
    )


# --------------------------------------------------------------- string surface


@register(
    "q61_string_functions",
    "D-family: wider string surface (initcap/lpad/translate/reverse/instr)",
    """SELECT n_nationkey,
              upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS name_initcap,
              lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_padded,
              translate(n_name, 'AEIOU', 'aeiou') AS name_translated,
              reverse(n_name) AS name_reversed,
              CAST(instr(n_name, 'A') AS INT) AS first_a,
              repeat('-', 3) || n_name AS name_dashed
       FROM nation""",
)
def q61(spark, sf):
    # nation names are single tokens, so initcap reduces to first-letter
    # capitalization in both engines.
    n = t(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.initcap(F.lower("n_name")).alias("name_initcap"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("key_padded"),
        F.translate("n_name", "AEIOU", "aeiou").alias("name_translated"),
        F.reverse("n_name").alias("name_reversed"),
        F.instr(F.col("n_name"), "A").cast("int").alias("first_a"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("n_name")).alias("name_dashed"),
    )


# --------------------------------------------------------------- array surface


@register(
    "q62_array_functions",
    "B/D-family: array surface (sequence/slice/position/flatten/zip)",
    """SELECT o_orderkey,
              array_to_string(range(1, 4), ',') AS seq3,
              array_to_string(list_slice(string_split(o_orderpriority, '-'), 1, 1), ',') AS prio_head,
              list_contains(string_split(o_orderpriority, '-'), 'URGENT') AS is_urgent,
              array_to_string(flatten([[o_orderkey], [o_custkey]]), ',') AS key_pair
       FROM orders""",
)
def q62(spark, sf):
    # Array outputs are string-joined at the edge: the driver's comparator
    # canonicalizes via pandas sort, which cannot hash array cells. The
    # array ops themselves (sequence/slice/contains/flatten) still run.
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.array_join(
            F.sequence(F.lit(1), F.lit(3)).cast("array<string>"), ","
        ).alias("seq3"),
        F.array_join(
            F.slice(F.split("o_orderpriority", "-"), 1, 1), ","
        ).alias("prio_head"),
        F.array_contains(F.split("o_orderpriority", "-"), "URGENT").alias(
            "is_urgent"
        ),
        F.array_join(
            F.flatten(
                F.array(F.array(F.col("o_orderkey")), F.array(F.col("o_custkey")))
            ).cast("array<string>"),
            ",",
        ).alias("key_pair"),
    )


# --------------------------------------------------------------- SQL surface


@register(
    "q63_sql_exists_subquery",
    "SQL entry point: correlated EXISTS subquery (planned as semi join)",
    """SELECT o_orderkey, o_totalprice
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""",
)
def q63(spark, sf):
    t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        """
    )


@register(
    "q64_sql_scalar_subquery",
    "SQL entry point: scalar subquery in projection",
    """SELECT o_orderpriority,
              COUNT(*) AS n,
              (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS total_customers
       FROM orders GROUP BY o_orderpriority""",
)
def q64(spark, sf):
    t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    t(spark, sf, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               (SELECT COUNT(DISTINCT c_custkey) FROM customer_v) AS total_customers
        FROM orders_v GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------- pivot


@register(
    "q65_pivot",
    "E-family: pivot (wide conditional aggregation)",
    """SELECT o_orderpriority,
              COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
              COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
              COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
       FROM orders GROUP BY o_orderpriority""",
)
def q65(spark, sf):
    out = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


# --------------------------------------------------------------- full outer


@register(
    "q88_full_outer_join",
    "F-family: full outer join (reconcile two partial views, null both sides)",
    f"""WITH l AS (SELECT c_custkey, c_acctbal FROM customer
                   WHERE c_mktsegment = 'FURNITURE'),
         r AS (SELECT o_custkey, COUNT(*) AS n_f_orders,
                      {sql_dsum('o_totalprice')} AS f_spend
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
       SELECT COALESCE(l.c_custkey, r.o_custkey) AS custkey,
              l.c_acctbal AS c_acctbal,
              r.n_f_orders AS n_f_orders,
              r.f_spend AS f_spend
       FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey""",
)
def q88(spark, sf):
    # Both inputs are PARTIAL views (a segment of customers; only
    # finished orders), so unmatched rows exist on both sides — the
    # reconciliation shape full outer exists for. One shuffle on the
    # key; at scale the smaller side would broadcast but full outer
    # forbids it, so SMJ on custkey is the right (and chosen) plan.
    left = (
        t(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "FURNITURE")
        .select("c_custkey", "c_acctbal")
    )
    right = (
        t(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_f_orders"),
            dsum("o_totalprice", "f_spend"),
        )
    )
    return left.join(
        right, left.c_custkey == right.o_custkey, "full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_f_orders",
        "f_spend",
    )


# --------------------------------------------------------------- unpivot


@register(
    "q89_unpivot",
    "E-family: unpivot / melt (wide measures -> long key-value rows)",
    f"""WITH w AS (SELECT l_returnflag,
                          {sql_dsum('l_quantity')} AS sum_qty,
                          {sql_dsum('l_extendedprice')} AS sum_price,
                          {sql_dsum('l_discount')} AS sum_disc
                   FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
       UNION ALL
       SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM w
       UNION ALL
       SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM w""",
)
def q89(spark, sf):
    # unpivot is the Spark-native melt: no join, no shuffle beyond the
    # feeding aggregate — each wide row fans out to k long rows in place.
    wide = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            dsum("l_discount", "sum_disc"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    )


# ------------------------------------- correlated scalar subquery (TPC-H Q17)

_Q97_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
            AS DOUBLE) AS avg_yearly
FROM {li} , {pa}
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#13'
  AND CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(1,0))
        * (SELECT CAST(COUNT(*) AS DECIMAL(9,0)) FROM {li} l2
           WHERE l2.l_partkey = p_partkey)
      < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) FROM {li} l2
         WHERE l2.l_partkey = p_partkey)
"""


@register(
    "q97_sql_correlated_scalar",
    "SQL entry point: correlated scalar subquery in a predicate (TPC-H Q17)",
    _Q97_SQL.format(li="lineitem", pa="part"),
)
def q97(spark, sf):
    # The classic small-quantity-revenue query: keep lineitems whose
    # quantity is below 20% of that part's average. The correlated
    # condition l_quantity < 0.2*avg(..) is stated as the exact-integer
    # cross-multiplication 5*qty*cnt < sum(qty) (decimal widths chosen
    # to stay inside 38 digits in both engines), so row membership can
    # never flip on a float ulp. Catalyst decorrelates each scalar
    # subquery to an aggregate-then-join (RewriteCorrelatedScalarSubquery)
    # and MergeScalarSubqueries fuses the two aggregates over the same
    # correlation key into one — the physical plan is the same
    # per-partkey aggregate + join a hand-decorrelated DataFrame version
    # would build, with the brand filter pushed below both branches.
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    t(spark, sf, "part").createOrReplaceTempView("part_v")
    return spark.sql(_Q97_SQL.format(li="lineitem_v", pa="part_v"))


# ------------------------------------------------------ recursive CTE

_Q101_SQL = """
WITH RECURSIVE months(m, mx) AS (
  SELECT DATE_TRUNC('month', MIN(o_orderdate)),
         DATE_TRUNC('month', MAX(o_orderdate)) FROM {o}
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
),
mc AS (SELECT DATE_TRUNC('month', o_orderdate) AS m, COUNT(*) AS n
       FROM {o} GROUP BY 1)
SELECT months.m AS month_start, COALESCE(mc.n, 0) AS n_orders
FROM months LEFT JOIN mc ON months.m = mc.m
"""


@register(
    "q101_recursive_cte",
    "SQL entry point: recursive CTE month spine with zero-filled counts",
    _Q101_SQL.format(o="orders"),
)
def q101(spark, sf):
    # Spark 4 executes WITH RECURSIVE natively (UnionLoop iterations,
    # bounded by spark.sql.cteRecursionLevelLimit) — the SQL text here is
    # byte-identical in Spark and DuckDB, anchor and step included. The
    # spine grows with calendar time, not data volume (80 rows over the
    # order-date domain), so the recursion is driver-cheap no matter the
    # fact-table size. The max bound rides along as a recursion column
    # (m, mx) instead of a correlated scalar subquery in the step's
    # WHERE — Spark's UnionLoop re-plans the step per iteration, so a
    # subquery there would rescan orders ~80 times; carried as a column,
    # orders is scanned once for the anchor. The one data-sized
    # operation is the monthly rollup, which partial-aggregates before
    # its exchange. q96 answers the same
    # gap-fill shape with sequence+explode — this declares the recursive
    # surface itself.
    t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_Q101_SQL.format(o="orders_v"))


# ------------------------------------------------ Python UDTF surface


def _q109_oracle() -> str:
    toks = "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"
    return f"""
WITH tk AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tk GROUP BY doc_id, token),
r AS (SELECT doc_id, token, cnt,
             row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, token) AS rn
      FROM c)
SELECT doc_id, token, CAST(cnt AS INT) AS cnt FROM r WHERE rn <= 3
"""


@register(
    "q109_udtf_top_tokens",
    "UDTF surface: arrow-batched Python table function via LATERAL join",
    _q109_oracle(),
)
def q109(spark, sf):
    # The Spark 4 Python UDTF path: a table function lateral-joined per
    # row. Deliberately a query the engine can also answer relationally
    # (the oracle is the explode/groupBy/window form) so the UDTF
    # machinery itself is what's under test. This is the SLOW PATH —
    # per-row Python with arrow batching — declared for the cases the
    # relational form can't express (stateful per-doc parsers, external
    # tokenizers); anything countable stays in codegen (q80/q86/q87).
    from collections import Counter
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, cnt int")
    class TopTokens:
        def eval(self, text: str):  # noqa: D102 - driver contract
            toks = [w for w in re.split(r"\W+", (text or "").lower()) if w]
            best = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))
            for tok, cnt in best[:3]:
                yield tok, cnt

    spark.udtf.register("top_tokens", TopTokens)
    t(spark, sf, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT d.doc_id, s.token, s.cnt "
        "FROM documents_v d, LATERAL top_tokens(d.text) s"
    )


# ------------------------------------------------ VARIANT / semi-structured


@register(
    "q110_variant_json",
    "VARIANT surface: parse_json once, typed path extraction, agg",
    """SELECT event_type,
              COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_with_k,
              CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
              MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
       FROM events GROUP BY event_type""",
)
def q110(spark, sf):
    # Semi-structured scan path: parse the JSON payload ONCE into a
    # VARIANT (Spark 4's binary semi-structured type) and extract typed
    # paths from it — at 100 TB this is the difference between one
    # parse per row and one parse per extracted field that repeated
    # get_json_object calls would cost (q51 declares that legacy form).
    # Integer-only aggregates: no float determinism concerns.
    # try_parse_json (not parse_json): malformed payloads yield NULL —
    # matching the oracle's json_extract null semantics instead of
    # failing the whole scan on one bad row.
    ev = t(spark, sf, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# ------------------------------------------------- data-quality profile


@register(
    "q136_column_profile",
    "validation: one-pass column profiler (null count / distinct count / "
    "numeric min-max per column) — the schema-drift watchdog a lake "
    "pipeline runs on every ingest batch",
    """WITH s AS (
         SELECT COUNT(*) AS n_rows,
                COUNT(*) - COUNT(event_id) AS nn_event_id,
                COUNT(DISTINCT event_id) AS nd_event_id,
                CAST(MIN(event_id) AS DOUBLE) AS mn_event_id,
                CAST(MAX(event_id) AS DOUBLE) AS mx_event_id,
                COUNT(*) - COUNT(user_id) AS nn_user_id,
                COUNT(DISTINCT user_id) AS nd_user_id,
                CAST(MIN(user_id) AS DOUBLE) AS mn_user_id,
                CAST(MAX(user_id) AS DOUBLE) AS mx_user_id,
                COUNT(*) - COUNT(value) AS nn_value,
                COUNT(DISTINCT value) AS nd_value,
                CAST(MIN(value) AS DOUBLE) AS mn_value,
                CAST(MAX(value) AS DOUBLE) AS mx_value,
                COUNT(*) - COUNT(event_type) AS nn_event_type,
                COUNT(DISTINCT event_type) AS nd_event_type,
                MIN(event_type) AS ms_event_type,
                MAX(event_type) AS xs_event_type
         FROM events)
       SELECT col_name, n_rows, n_null, n_distinct, min_num, max_num,
              min_str, max_str
       FROM (
         SELECT 'event_id' AS col_name, n_rows,
                CAST(nn_event_id AS BIGINT) AS n_null,
                CAST(nd_event_id AS BIGINT) AS n_distinct,
                mn_event_id AS min_num, mx_event_id AS max_num,
                CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM s
         UNION ALL
         SELECT 'user_id', n_rows, CAST(nn_user_id AS BIGINT),
                CAST(nd_user_id AS BIGINT), mn_user_id, mx_user_id, NULL, NULL
         FROM s
         UNION ALL
         SELECT 'value', n_rows, CAST(nn_value AS BIGINT),
                CAST(nd_value AS BIGINT), mn_value, mx_value, NULL, NULL
         FROM s
         UNION ALL
         SELECT 'event_type', n_rows, CAST(nn_event_type AS BIGINT),
                CAST(nd_event_type AS BIGINT), CAST(NULL AS DOUBLE),
                CAST(NULL AS DOUBLE), ms_event_type, xs_event_type
         FROM s)""",
)
def q136(spark, sf):
    # All per-column statistics ride ONE scan: a single wide aggregate
    # row (Spark plans the multi-column COUNT(DISTINCT)s as one expand +
    # two-phase distinct, q106's pattern), then a 4-way stack of that
    # 1-row result into long form — the unpivot costs nothing, the scan
    # is the only data-sized work. At 100 TB this is the per-batch
    # profile job: one pass, mergeable counters, no shuffle beyond the
    # aggregate's own exchange.
    ev = t(spark, sf, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("event_id")).alias("nn_event_id"),
        F.countDistinct("event_id").alias("nd_event_id"),
        F.min("event_id").cast("double").alias("mn_event_id"),
        F.max("event_id").cast("double").alias("mx_event_id"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("nn_user_id"),
        F.countDistinct("user_id").alias("nd_user_id"),
        F.min("user_id").cast("double").alias("mn_user_id"),
        F.max("user_id").cast("double").alias("mx_user_id"),
        (F.count(F.lit(1)) - F.count("value")).alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
        F.min("value").cast("double").alias("mn_value"),
        F.max("value").cast("double").alias("mx_value"),
        (F.count(F.lit(1)) - F.count("event_type")).alias("nn_event_type"),
        F.countDistinct("event_type").alias("nd_event_type"),
        F.min("event_type").alias("ms_event_type"),
        F.max("event_type").alias("xs_event_type"),
    )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def row(name, nn, nd, mn, mx, ms, xs):
        return s.select(
            F.lit(name).alias("col_name"),
            F.col("n_rows"),
            F.col(nn).cast("bigint").alias("n_null"),
            F.col(nd).cast("bigint").alias("n_distinct"),
            (F.col(mn) if mn else null_d).alias("min_num"),
            (F.col(mx) if mx else null_d).alias("max_num"),
            (F.col(ms) if ms else null_s).alias("min_str"),
            (F.col(xs) if xs else null_s).alias("max_str"),
        )

    return (
        row("event_id", "nn_event_id", "nd_event_id", "mn_event_id", "mx_event_id", None, None)
        .unionByName(row("user_id", "nn_user_id", "nd_user_id", "mn_user_id", "mx_user_id", None, None))
        .unionByName(row("value", "nn_value", "nd_value", "mn_value", "mx_value", None, None))
        .unionByName(row("event_type", "nn_event_type", "nd_event_type", None, None, "ms_event_type", "xs_event_type"))
    )


# --------------------------------------------------- distribution drift


@register(
    "q137_psi_drift",
    "validation: population-stability-index drift between the first and "
    "second half of the event stream — the distribution-shift monitor "
    "run between training snapshots",
    """WITH b AS (
         SELECT LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
                CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref' ELSE 'cur' END AS side
         FROM events),
       c AS (
         SELECT bucket,
                COUNT(*) FILTER (side = 'ref') AS c_ref,
                COUNT(*) FILTER (side = 'cur') AS c_cur
         FROM b GROUP BY bucket),
       tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM c),
       p AS (
         SELECT bucket, c_ref, c_cur,
                (CAST(c_ref AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + 5.0) AS p_ref,
                (CAST(c_cur AS DOUBLE) + 0.5) / (CAST(n_cur AS DOUBLE) + 5.0) AS p_cur
         FROM c CROSS JOIN tot)
       SELECT bucket, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_cur AS BIGINT) AS c_cur,
              round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
       FROM p ORDER BY bucket""",
)
def q137(spark, sf):
    # PSI = sum over buckets of (p_cur - p_ref) ln(p_cur / p_ref): the
    # standard drift score between a reference window and the current
    # one. Laplace smoothing (+0.5 per bucket, +5 per side) keeps the
    # log finite when a bucket empties on one side. One scan, one
    # 10-row aggregate; the per-bucket terms are emitted (the rollup to
    # a single score is a trivial second aggregate) so the monitor can
    # show WHICH region of the distribution moved. Identical operand
    # order both engines + round(...,6) ⇒ hash-stable.
    ev = t(spark, sf, "events")
    b = ev.select(
        F.least(F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9).cast("bigint")).alias("bucket"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "ref")
        .otherwise("cur")
        .alias("side"),
    )
    c = b.groupBy("bucket").agg(
        F.count(F.when(F.col("side") == "ref", 1)).alias("c_ref"),
        F.count(F.when(F.col("side") == "cur", 1)).alias("c_cur"),
    )
    tot = c.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p_ref = (F.col("c_ref").cast("double") + 0.5) / (
        F.col("n_ref").cast("double") + 5.0
    )
    p_cur = (F.col("c_cur").cast("double") + 0.5) / (
        F.col("n_cur").cast("double") + 5.0
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("c_ref").cast("bigint").alias("c_ref"),
            F.col("c_cur").cast("bigint").alias("c_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------- winsorization


@register(
    "q141_winsorize",
    "prep: per-group winsorization — clip each event's value to its "
    "event_type's exact [p05, p95] band (outlier-robust feature prep)",
    """WITH b AS (
         SELECT event_type,
                quantile_cont(value, 0.05) AS lo,
                quantile_cont(value, 0.95) AS hi
         FROM events GROUP BY event_type)
       SELECT e.event_id, e.event_type, e.value,
              LEAST(GREATEST(e.value, b.lo), b.hi) AS value_w,
              (e.value < b.lo OR e.value > b.hi) AS clipped
       FROM events e JOIN b USING (event_type)""",
)
def q141(spark, sf):
    # The band table is |event_types| rows — broadcast back to the fact
    # scan, so the clip is a map stage; the only shuffle is the
    # percentile aggregate's own exchange. Spark `percentile` = exact
    # linear interpolation = DuckDB quantile_cont (q59's equivalence).
    ev = t(spark, sf, "events")
    b = F.broadcast(
        ev.groupBy("event_type").agg(
            F.percentile("value", F.lit(0.05)).alias("lo"),
            F.percentile("value", F.lit(0.95)).alias("hi"),
        )
    )
    return ev.join(b, "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "value_w"
        ),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )


# -------------------------------------------------- retention cohorts


@register(
    "q143_retention_cohorts",
    "analytics: weekly retention triangle — users grouped by first-seen "
    "week, counted in each later activity week (the engagement rollup "
    "every event warehouse serves)",
    """WITH f AS (
         SELECT user_id,
                CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
         FROM events),
       c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM f GROUP BY user_id)
       SELECT c.cohort_wk, f.wk - c.cohort_wk AS week_offset,
              COUNT(DISTINCT f.user_id) AS n_active
       FROM f JOIN c USING (user_id)
       GROUP BY c.cohort_wk, f.wk - c.cohort_wk""",
)
def q143(spark, sf):
    # Two shuffles total: the per-user cohort aggregate (user-keyed) and
    # the final (cohort, offset) rollup; the cohort table joins back on
    # the same user key, so AQE plans it without a third exchange. At
    # 100 TB the cohort table is |users| rows — small enough to
    # broadcast, bounded regardless of event volume.
    ev = t(spark, sf, "events")
    f = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            / 7
        )
        .cast("bigint")
        .alias("wk"),
    )
    c = f.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        f.join(c, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
