"""A/B: attribute q39p's contraction-leg superlinearity (round-9 verdict #1).

SCALING.md's leg table has the cap=256 contraction at 1.8 s (sf1) ->
95.2 s (sf10) — 53x for exactly-10x contracted counts — while the
UNCAPPED contraction over 4x MORE edge rows reads 75.5 s at sf10. The
leg is two relabel joins of the doubled edge set against l1 (node ->
min-neighborhood label) plus a distinct; every row count is measured
linear, so the excess must be execution: a join-strategy flip (BHJ at
sf1 -> SMJ at sf10 once l1 outgrows the broadcast threshold), the
localCheckpoint block store under the joins, or plain process-history
heap tax from the in-situ leg1 (the decompose instrument runs legs
sequentially in one JVM).

This instrument isolates the leg: `prep` builds the cap=256 half edge
set ONCE to a persistent parquet (untimed), then each variant runs in a
FRESH process that reads the prebuilt edges, so the timed region is the
contraction alone with no leg1 residue:

  shipped   — exactly the operator's shape: l1 cut via localCheckpoint,
              two relabel joins, distinct, cut(contracted), count.
  nostore   — same, but no cut on the contracted output (pure compute).
  l1parquet — l1 materialized via the columnar parquet spill instead of
              localCheckpoint (the r9 edge-store fix applied to l1).
  bcast     — F.broadcast(l1) forced on both relabel joins.
  hashjoin  — preferSortMergeJoin=false (shuffled hash join: no sort of
              the edge set).
  insitu    — leg1 (blocked join + levenshtein + spill) runs first in
              the SAME process, then the shipped contraction is timed:
              reproduces the decompose context to expose history tax.

Each variant prints the physical join node types actually chosen, so a
BHJ/SMJ flip across scales is visible, not inferred.

Usage:
  python scripts/ab_q39_contraction.py SF_DIR prep EDGES_DIR
  python scripts/ab_q39_contraction.py SF_DIR {shipped|nostore|l1parquet|bcast|hashjoin} EDGES_DIR
  python scripts/ab_q39_contraction.py SF_DIR insitu -
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.dedup_fuzzy import candidate_pairs
from ipes_data_pipeline_spark.operators.util import cut
from ipes_data_pipeline_spark.session import get_session

BLOCK_CAP = 256


def join_nodes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )


def main() -> None:
    sf_dir, variant, edges_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_session("ab-q39-contraction")
    spark.sparkContext.setLogLevel("ERROR")
    if variant == "hashjoin":
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_cust = cust.count()  # warm fs/JVM
    block = F.substring(F.col("c_name"), 1, 15)

    if variant == "prep":
        half = candidate_pairs(
            cust, "c_custkey", "c_name", block, max_edits=2, block_cap=BLOCK_CAP
        )
        # candidate_pairs returns the doubled set; keep the half (src<dst)
        half.filter(F.col("src") < F.col("dst")).write.mode(
            "overwrite"
        ).parquet(edges_dir)
        n = spark.read.parquet(edges_dir).count()
        print(f"PREP rows={n} dir={edges_dir}", flush=True)
        return

    if variant == "insitu":
        half = candidate_pairs(
            cust, "c_custkey", "c_name", block, max_edits=2, block_cap=BLOCK_CAP
        ).filter(F.col("src") < F.col("dst"))
        half.count()
    else:
        half = spark.read.parquet(edges_dir)

    edges = half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = cust.select(F.col("c_custkey").alias("node"))
    e_self = edges.unionAll(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    )

    t0 = time.perf_counter()
    l1 = e_self.groupBy(F.col("src").alias("node")).agg(F.min("dst").alias("lab"))
    l1 = cut(l1, via_parquet=variant in ("l1parquet", "bothparquet"))
    t_l1 = time.perf_counter() - t0

    lsrc = l1.withColumnRenamed("node", "src").withColumnRenamed("lab", "src_lab")
    ldst = l1.withColumnRenamed("node", "dst").withColumnRenamed("lab", "dst_lab")
    if variant == "bcast":
        lsrc, ldst = F.broadcast(lsrc), F.broadcast(ldst)
    contracted = (
        e_self.join(lsrc, "src")
        .join(ldst, "dst")
        .select(F.col("src_lab").alias("src"), F.col("dst_lab").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    lazy = contracted  # keep the pre-cut frame: AQE's final plan is only
    # readable off the QueryExecution that ran an action (nostore's count)
    t0 = time.perf_counter()
    if variant == "nostore":
        n = contracted.count()
    elif variant in ("contrparquet", "bothparquet"):
        contracted = cut(contracted, via_parquet=True)
        n = contracted.count()
    else:
        contracted = cut(contracted)
        n = contracted.count()
    t_contr = time.perf_counter() - t0
    joins = join_nodes(lazy) if variant == "nostore" else "-"
    print(
        f"VARIANT={variant} SF_DIR={sf_dir} N_CUST={n_cust} "
        f"L1_SEC={t_l1:.2f} CONTRACTION_SEC={t_contr:.2f} "
        f"CONTRACTED_ROWS={n} JOINS={joins}",
        flush=True,
    )


if __name__ == "__main__":
    main()
