"""PageRank physical-variant ledger bench (round 5).

Measures, at $SPARK_GRAFT_SF_DIR on the q140 graph:
  sparse  — shipped operators.graph.pagerank (contrib-carried rank state,
            ONE final |nodes| left join)
  dense   — the round-4 shape (per-round |nodes| left join) — inline copy
  preagg  — dense + parallel-edge pre-aggregation to (src,dst,Σw) before
            the loop (r3 suggestion; q140's edge builder already groups,
            so this measures the pure overhead of the extra shuffle)

Usage: python scripts/bench_pagerank_variants.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.graph import _SCALE, pagerank
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


def pagerank_dense(nodes, edges, iterations=3, damping_pct=85, preagg=False):
    """Inline copy of the round-4 loop (per-round |nodes| left join)."""
    base_u = (100 - damping_pct) * _SCALE // 100
    edges = cut(edges)
    if preagg:
        edges = edges.groupBy("src", "dst").agg(
            F.sum("w").cast("long").alias("w")
        )
        edges = cut(edges)
    out_w = edges.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    ew = edges.join(F.broadcast(out_w), "src")
    nodes = cut(nodes)
    rank = nodes.select("node", F.lit(1 * _SCALE).cast("long").alias("rank_u"))
    for _ in range(iterations):
        rank_side = F.broadcast(rank)
        contrib = (
            ew.join(rank_side, ew.src == rank.node)
            .select(
                F.col("dst"),
                F.expr("(rank_u * CAST(w AS BIGINT)) div out_w").alias("c_u"),
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(base_u).cast("long")
                    + F.expr(f"({damping_pct} * sum(c_u)) div 100")
                ).alias("new_rank_u")
            )
        )
        rank = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            F.coalesce(F.col("new_rank_u"), F.lit(base_u).cast("long")).alias(
                "rank_u"
            ),
        )
    return rank.select(
        "node", (F.col("rank_u").cast("double") / _SCALE).alias("rank")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session("bench-pagerank-variants")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    variants = {
        "sparse": lambda n, e: pagerank(n, e, iterations=3, damping_pct=85),
        "dense": lambda n, e: pagerank_dense(n, e),
        "preagg": lambda n, e: pagerank_dense(n, e, preagg=True),
    }
    samples = {k: [] for k in variants}
    checksum = {}
    for _ in range(runs):
        for name, fn in variants.items():
            nodes, edges = _graph(spark, sf_dir)
            t0 = time.time()
            df = fn(nodes, edges)
            agg = df.agg(
                F.sum("rank").alias("s"), F.count(F.lit(1)).alias("n")
            ).collect()[0]
            samples[name].append(time.time() - t0)
            checksum[name] = (round(agg["s"], 6), agg["n"])
    assert len(set(checksum.values())) == 1, f"variants disagree: {checksum}"
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "medians": {
                    k: round(statistics.median(v), 3) for k, v in samples.items()
                },
                "all": {k: [round(x, 3) for x in v] for k, v in samples.items()},
                "checksum": {k: list(v) for k, v in checksum.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
