"""HLL sketch properties: accuracy, mergeability, register bound.

Everything is deterministic (md5-derived hashes), so the observed error
is a fixed number, not a random draw — the bounds just leave headroom
over the theoretical σ ≈ 1.04/√1024 ≈ 3.3%.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.functions.sketches import (
    M,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_hll_accuracy_10k(spark):
    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = hll_estimate(hll_registers(df, ["g"], "v"), ["g"]).collect()[0]["hll_est"]
    assert abs(est - 10_000) / 10_000 < 0.06, est


def test_hll_small_range_linear_counting(spark):
    # 5 distinct values << 2.5m: the linear-counting branch must engage
    # and be near-exact
    df = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 5).cast("string").alias("v")
    )
    est = hll_estimate(hll_registers(df, ["g"], "v"), ["g"]).collect()[0]["hll_est"]
    assert abs(est - 5) < 0.1, est


def test_hll_merge_equals_direct(spark):
    # registers built per-shard then merged == registers built directly;
    # duplicates across shards must not inflate the union estimate
    df = spark.range(4_000).select(
        (F.col("id") % 4).alias("shard"),
        F.lit("g").alias("g"),
        (F.col("id") % 1500).cast("string").alias("v"),  # overlap across shards
    )
    direct = hll_registers(df, ["g"], "v")
    sharded = hll_merge(hll_registers(df, ["g", "shard"], "v"), ["g"])
    a = {(r["j"], r["rho"]) for r in direct.collect()}
    b = {(r["j"], r["rho"]) for r in sharded.collect()}
    assert a == b
    assert len(a) <= M


def test_hll_registers_bounded(spark):
    # the sketch never exceeds M rows per group no matter the input size
    df = spark.range(50_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    assert hll_registers(df, ["g"], "v").count() <= M


def test_cms_overestimates_and_bounds_registers(spark):
    from ipes_data_pipeline_spark.functions.sketches import (
        CMS_D,
        CMS_W,
        cms_estimate,
        cms_table,
    )

    # 3000 distinct values >> W=512 buckets forces collisions; skewed
    # counts (value k appears k%7+1 times) give non-trivial exact counts
    stream = spark.range(3000).select(
        F.explode(
            F.array_repeat(F.col("id").cast("string"), (F.col("id") % 7 + 1).cast("int"))
        ).alias("v")
    )
    cms = cms_table(stream, [], "v")
    n_regs = cms.count()
    assert n_regs <= CMS_D * CMS_W
    exact = stream.groupBy("v").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(cms, exact, "v").collect()
    assert len(est) == 3000
    # one-sided error: never under the true count
    assert all(r["cms_est"] >= r["n_exact"] for r in est)
    # with ~12k items over 512 buckets, min-over-4-rows stays tight
    avg_over = sum(r["cms_est"] - r["n_exact"] for r in est) / len(est)
    assert avg_over < 30, avg_over


def test_cms_merge_equals_direct(spark):
    from ipes_data_pipeline_spark.functions.sketches import cms_merge, cms_table

    df = spark.range(2000).select(
        (F.col("id") % 2).alias("half"), F.col("id").cast("string").alias("v")
    )
    per_half = cms_table(df, ["half"], "v")
    merged = cms_merge(per_half.drop("half"), [])
    direct = cms_table(df, [], "v")
    # register tables identical: merge is exact, not approximate
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_histogram_quantile_brackets_exact(spark):
    # q103's estimate interpolates inside the bucket holding the target
    # rank, so it can never be more than one bucket width (1000) from
    # the exact percentile.
    from ipes_data_pipeline_spark.queries import REGISTRY, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    est = {
        (r["l_returnflag"], r["q"]): r["est_price"]
        for r in REGISTRY["q103_quantile_sketch"].spark(spark, sf).collect()
    }
    exact_rows = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(cast(l_extendedprice as double), array(0.5, 0.9, 0.99))"
            ).alias("p")
        )
        .collect()
    )
    assert len(est) == 9
    for row in exact_rows:
        for q, ex in zip((0.5, 0.9, 0.99), row["p"]):
            assert abs(est[(row["l_returnflag"], q)] - ex) <= 1000.0, (
                row["l_returnflag"],
                q,
                est[(row["l_returnflag"], q)],
                ex,
            )
