"""HyperLogLog distinct-count sketches, deterministic across engines.

Spark's own ``approx_count_distinct`` is an opaque HLL++ whose estimate
no other engine reproduces bit-for-bit, so it can't sit behind the
DuckDB value oracle. This is a from-first-principles HLL (Flajolet et
al. 2007) built only on primitives both engines evaluate identically:

- hash: first 15 hex chars of ``md5(value)`` = a 60-bit integer;
- register index ``j`` = low ``p`` bits; remainder ``w`` has 50 bits;
- rank ``rho`` = leading zeros of ``w`` + 1 = ``51 - len(bin(w))``
  (pure integer/string ops — no float ``log2`` whose last-ulp rounding
  could differ between libms);
- the harmonic sum ``Σ 2^-rho`` is kept EXACT by scaling with ``2^51``:
  each register contributes the integer ``2^(51-rho)``, absent registers
  ``2^51``; the bigint sum is order-independent, so Spark's partial
  aggregation and DuckDB's single-threaded fold agree exactly;
- the final estimate is one double division from exact integers, plus
  the standard linear-counting small-range correction.

Why it scales: a register table is ≤ ``m`` rows per group and the merge
is an elementwise ``max`` — partial-aggregatable (map-side combine), and
**mergeable**: store registers per (group, day) once, then roll up any
date range by re-maxing registers — the continuous-aggregate pattern —
instead of rescanning raw events. At 100 TB the raw scan happens once;
every downstream distinct-count is a ~``m × groups``-row aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 10  # register-index bits
M = 1 << P  # 1024 registers
WBITS = 60 - P  # rank domain: 50-bit remainder
_ALPHA = 0.7213 / (1.0 + 1.079 / M)  # bias constant for m >= 128
# single pre-folded double so both engines divide the SAME constant by S
# (DuckDB parses plain decimal literals as DECIMAL and overflows on the
# product; Spark would round a two-literal product once more)
_SCALE = _ALPHA * M * M * float(1 << (WBITS + 1))
_SMALL = 2.5 * M


def hll_prepare(df: DataFrame, col: str) -> DataFrame:
    """Add ``j`` (register index) and ``rho`` (rank) for ``col``.

    Null values carry no distinct-count information and are dropped (the
    oracle SQL must filter them identically).
    """
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    df = df.where(F.col(col).isNotNull()).withColumn("__h", h)
    j = F.pmod(F.col("__h"), F.lit(M))
    w = F.expr(f"__h div {M}")
    rho = F.when(w == 0, F.lit(WBITS + 1)).otherwise(
        F.lit(WBITS + 1) - F.length(F.bin(w))
    )
    return df.withColumn("j", j).withColumn("rho", rho).drop("__h")


def hll_registers(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """Per-group register table: (group_cols..., j, rho=max rank).

    ≤ ``M`` rows per group regardless of input size; ``max`` combines
    map-side. This is the mergeable/storable form of the sketch.
    """
    return (
        hll_prepare(df, col)
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union sketches: elementwise max over registers, regrouped on a
    coarser key (e.g. day-level sketches → month key). Associative and
    idempotent, so any rollup hierarchy is sound."""
    return registers.groupBy(*group_cols, "j").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate column ``hll_est`` from a register table.

    The scaled harmonic sum S = Σ_j 2^(51-rho_j) (+ 2^51 per absent
    register) stays in exact bigint arithmetic; max value M·2^51 = 2^61
    fits signed 64-bit. Only the last division and the small-range
    ``ln`` run in floating point, on identical operands in both engines.
    """
    scaled = F.expr(f"CAST(pow(2.0D, {WBITS + 1} - rho) AS BIGINT)")
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(scaled).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_regs"),
    )
    zeros = F.lit(M) - F.col("__n_regs")
    s_total = F.col("__s_present") + zeros * F.lit(1 << (WBITS + 1))
    e_raw = F.lit(_SCALE) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(_SMALL)) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per_group.select(*group_cols, est.alias("hll_est"))


def sql_hll_estimate(
    source: str, group_cols: list[str], col: str, out: str = "hll_est"
) -> str:
    """DuckDB oracle for registers+estimate over ``source`` (a table name
    or parenthesized subquery with columns group_cols + col)."""
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT {g}, ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {source} WHERE {col} IS NOT NULL),
prep AS (
  SELECT {g}, h % {M} AS j,
         CASE WHEN h // {M} = 0 THEN {WBITS + 1}
              ELSE {WBITS + 1} - length(bin(h // {M})) END AS rho
  FROM hashed),
regs AS (SELECT {g}, j, MAX(rho) AS rho FROM prep GROUP BY {g}, j),
agg AS (
  SELECT {g},
         CAST(SUM(CAST(power(2, {WBITS + 1} - rho) AS BIGINT)) AS BIGINT)
           AS s_present,
         COUNT(*) AS n_regs
  FROM regs GROUP BY {g}),
est AS (
  SELECT {g},
         CAST({_SCALE!r} AS DOUBLE)
           / CAST(s_present + ({M} - n_regs)
                  * CAST(power(2, {WBITS + 1}) AS BIGINT) AS DOUBLE) AS e_raw,
         {M} - n_regs AS zeros
  FROM agg)
SELECT {g},
       CASE WHEN e_raw <= CAST({_SMALL!r} AS DOUBLE) AND zeros > 0
            THEN CAST({float(M)!r} AS DOUBLE)
                 * ln(CAST({float(M)!r} AS DOUBLE) / CAST(zeros AS DOUBLE))
            ELSE e_raw
       END AS {out}
FROM est
"""


# --------------------------------------------------- Count-Min sketch

CMS_D = 4  # hash rows: the four 32-bit slices of one md5 digest
CMS_W = 512  # buckets per row


def cms_buckets(col) -> "F.Column":
    """Array of CMS_D bucket indices for a value — the r-th 8-hex-char
    (32-bit) slice of one md5 digest, mod CMS_W. One md5 pass yields all
    four hash families (the minhash_slice trick); fixed-width hex keeps
    the arithmetic identical in any engine with md5 + substr + conv."""
    col = F.col(col) if isinstance(col, str) else col
    h = F.md5(col.cast("string"))
    return F.array(
        *[
            F.pmod(
                F.conv(F.substring(h, r * 8 + 1, 8), 16, 10).cast("long"),
                F.lit(CMS_W),
            )
            for r in range(CMS_D)
        ]
    )


def cms_table(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """Per-group Count-Min register table: (group..., r, b, cnt).

    ≤ CMS_D × CMS_W rows per group regardless of input size, and the
    count combines map-side — the shuffle carries sketch rows, never the
    stream. Mergeable: re-grouping with SUM on a coarser key unions
    sketches (see :func:`cms_merge`), the same continuous-aggregate
    pattern as the HLL registers.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), F.element_at("__cb", r + 1).alias("b")
            )
            for r in range(CMS_D)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .withColumn("__cb", cms_buckets(col))
        .select(*group_cols, F.explode(pairs).alias("__p"))
        .groupBy(*group_cols, F.col("__p.r").alias("r"), F.col("__p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(cms: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union sketches onto a coarser key: elementwise SUM per (r, b).
    Exact (counts are additive), associative, order-independent."""
    return cms.groupBy(*group_cols, "r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cms: DataFrame, probes: DataFrame, col: str) -> DataFrame:
    """Point-frequency estimates: min over the D bucket counts.

    ``cms`` must be a single (global) sketch table (r, b, cnt); probes
    gain a ``cms_est`` column. The sketch is CMS_D×CMS_W rows — always
    broadcast; estimates never shuffle the probe side. Guarantees
    cms_est >= true count (never under), within eN/W with prob 1-delta^D.
    """
    exploded = probes.withColumn("__cb", cms_buckets(col)).select(
        "*", F.posexplode("__cb").alias("r", "b")
    )
    return (
        exploded.join(F.broadcast(cms), ["r", "b"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def sql_cms_estimate(stream: str, probes: str, col: str) -> str:
    """DuckDB twin: global CMS over ``stream`` (one column ``{col}``),
    estimates for ``probes`` (must carry {col}; other columns pass
    through). Same md5-slice buckets, same min-over-rows estimate."""
    slices = ", ".join(
        f"(('0x' || substr(h, {r * 8 + 1}, 8))::BIGINT % {CMS_W})" for r in range(CMS_D)
    )
    return f"""
WITH s_h AS (SELECT md5(CAST({col} AS VARCHAR)) AS h FROM {stream}
             WHERE {col} IS NOT NULL),
s_b AS (SELECT unnest([{slices}]) AS b,
               unnest(range({CMS_D})) AS r FROM s_h),
cms AS (SELECT r, b, COUNT(*) AS cnt FROM s_b GROUP BY r, b),
p_h AS (SELECT p.*, md5(CAST(p.{col} AS VARCHAR)) AS h FROM {probes} p),
p_b AS (SELECT p_h.*, unnest([{slices}]) AS b,
               unnest(range({CMS_D})) AS r FROM p_h),
est AS (SELECT p_b.* EXCLUDE (h, r, b), MIN(COALESCE(cms.cnt, 0)) AS cms_est
        FROM p_b LEFT JOIN cms USING (r, b)
        GROUP BY ALL)
SELECT * FROM est
"""
