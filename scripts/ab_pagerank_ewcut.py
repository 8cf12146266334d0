"""A/B (round 11): pagerank with the (edges ⋈ out_w) frame cut ONCE vs
the shipped per-round re-join of checkpointed edges against the out_w
broadcast. Each round's broadcast-rank build re-executes the ew subtree
in the shipped form (scan + broadcast(out_w) join per round, and every
out_w broadcast build is its own nested job); pinning ew trades one
materialization job for iterations x (join + out_w-broadcast) jobs.

Also counts Spark jobs per variant via the status tracker.

Usage: python scripts/ab_pagerank_ewcut.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.graph import _SCALE
from ipes_data_pipeline_spark.operators.util import cut
from ipes_data_pipeline_spark.session import get_session


def _graph(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), (-(F.col("l_suppkey") + 1)).alias("s")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = e0.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionAll(e0.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
    nodes = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("node"))
        .union(
            spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
                (-(F.col("s_suppkey") + 1)).alias("node")
            )
        )
        .distinct()
    )
    return nodes, edges


def pagerank_variant(nodes, edges, iterations=3, damping_pct=85, ewcut=False):
    base_u = (100 - damping_pct) * _SCALE // 100
    edges = cut(edges)
    out_w = edges.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    ew = edges.join(F.broadcast(out_w), "src")
    if ewcut:
        ew = cut(ew)
    nodes = cut(nodes)
    rank = nodes.select("node", F.lit(1 * _SCALE).cast("long").alias("rank_u"))
    default_u = 1 * _SCALE
    for _ in range(iterations):
        rank_side = F.broadcast(rank)
        rank = (
            ew.join(rank_side, ew.src == rank.node, "left")
            .select(
                F.col("dst"),
                F.expr(
                    f"((coalesce(rank_u, {default_u}) * CAST(w AS BIGINT)))"
                    " div out_w"
                ).alias("c_u"),
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(base_u).cast("long")
                    + F.expr(f"({damping_pct} * sum(c_u)) div 100")
                ).alias("rank_u")
            )
            .select(F.col("dst").alias("node"), "rank_u")
        )
        default_u = base_u
    return nodes.join(rank, "node", "left").select(
        "node",
        (
            F.coalesce(F.col("rank_u"), F.lit(base_u).cast("long")).cast("double")
            / _SCALE
        ).alias("rank"),
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-pagerank")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    sc = spark.sparkContext
    import gc

    samples = {"shipped": [], "ewcut": []}
    jobs = {}
    for r in range(runs):
        for label, ewcut in (("shipped", False), ("ewcut", True)):
            sc.setJobGroup(f"{label}-{r}", f"pagerank {label} pass {r}")
            t0 = time.perf_counter()
            nodes, edges = _graph(spark, sf_dir)
            df = pagerank_variant(nodes, edges, ewcut=ewcut)
            df.write.mode("overwrite").format("noop").save()
            samples[label].append(time.perf_counter() - t0)
            jobs[label] = len(
                sc.statusTracker().getJobIdsForGroup(f"{label}-{r}")
            )
            sc.setJobGroup(None, None)
            del df
            gc.collect()
            sc._jvm.System.gc()
            time.sleep(0.2)
    for label, ts in samples.items():
        print(
            f"{label}: median {statistics.median(ts):.3f}  jobs/run {jobs[label]}"
            f"  runs [{' '.join(f'{t:.2f}' for t in ts)}]"
        )
    # value identity
    nodes, edges = _graph(spark, sf_dir)
    a = {r["node"]: r["rank"] for r in pagerank_variant(nodes, edges).collect()}
    nodes, edges = _graph(spark, sf_dir)
    b = {
        r["node"]: r["rank"]
        for r in pagerank_variant(nodes, edges, ewcut=True).collect()
    }
    print("identical:", a == b, "nodes:", len(a))


if __name__ == "__main__":
    main()
