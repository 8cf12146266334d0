"""Decompose q39/q39p wall growth into per-leg counts and walls.

VERDICT r8 flagged the one un-decomposed growth number: q39 29x and
q39p 24x sf1->sf10 wall growth in local mode, well above the ~10x ideal
for fixed cores, with no DuckDB control (the oracle blows the cap at
sf10). This instrument answers WHERE the superlinearity lives.

Why the algorithm itself is linear per decade on this data: the block
key substr(c_name,1,15) groups customers by the first 6 of their 9 id
digits -> every block holds exactly 1000 consecutive names (names
differ only in the last 3 digits). So per decade:
  blocks           = n/1000          (x10 per decade)
  candidate pairs  = blocks * C(1000,2) ~ 500*n   (x10)
  refined edges    = pairs with <=2 differing digits among the last 3
                   = n * (27 + 243) / 2 half-edges ~ 135*n (x10)
and the component diameter is scale-independent (within-block), so the
contraction round count is constant. Any wall growth beyond ~10x is
therefore EXECUTION (shuffle spill, GC, localCheckpoint store churn in
the single shared JVM), not plan shape.

Per sf_dir this script measures, each leg as its own timed action over
the SAME checkpointed intermediates the real operator uses:
  leg1 candidate+refine: candidate_pairs().count() -- blocked join +
       3-arg levenshtein + localCheckpoint of the half edge set
  leg2 l1: min over closed neighborhood (one groupBy over 2x edges)
  leg3 contraction: two joins vs l1 + distinct (+ the isEmpty probe)
  leg4 fixpoint + mapback: only if contraction is non-empty
It also records the analytic pair count from block sizes via DuckDB
(free) so the measured edge counts can be checked against theory.

Usage: python scripts/decompose_q39.py SF_DIR [block_cap] [out.json]
(run once per sf_dir in a FRESH process; compare legs across scales)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.dedup_fuzzy import (
    candidate_pairs,
    min_label_components,
)
from ipes_data_pipeline_spark.operators.util import cut
from ipes_data_pipeline_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1]
    block_cap = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "none" else None
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/q39_decompose.json"

    # analytic leg: pair volume implied by the block-size distribution
    con = duckdb.connect()
    cap_expr = (
        "SUM(b * (b - 1) / 2)"
        if block_cap is None
        # sub-salted: a block of size b splits into ceil(b/cap) buckets of
        # ~b/ceil rows each -> sum over buckets of C(bucket,2)
        else f"SUM(CEIL(b / {block_cap}.0) * (b / CEIL(b / {block_cap}.0)) * (b / CEIL(b / {block_cap}.0) - 1) / 2)"
    )
    blocks, analytic_pairs = con.sql(
        f"""SELECT COUNT(*), {cap_expr} FROM (
              SELECT substr(c_name, 1, 15) AS blk, COUNT(*)::DOUBLE AS b
              FROM '{sf_dir}/customer.parquet' GROUP BY 1)"""
    ).fetchone()

    spark = get_session("q39-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_cust = cust.count()
    block = F.substring(F.col("c_name"), 1, 15)

    legs: dict[str, dict[str, float]] = {}

    def leg(name, fn):
        t0 = time.perf_counter()
        val = fn()
        legs[name] = {"wall_s": round(time.perf_counter() - t0, 3), "rows": val}
        print(f"{name}: {legs[name]}", flush=True)
        return val

    # leg 1 — blocked join + levenshtein refine + checkpoint of half edges.
    # candidate_pairs localCheckpoints EAGERLY at construction, so the
    # construction itself must sit inside the timed region (the first cut
    # of this instrument timed only the count over already-materialized
    # blocks and read 0.6 s for the dominant leg).
    edges_box: list = []

    def _leg1():
        edges_box.append(
            candidate_pairs(
                cust, "c_custkey", "c_name", block,
                max_edits=2, block_cap=block_cap,
            )
        )
        return edges_box[0].count() // 2  # half-edge count

    leg("edges_refined", _leg1)
    edges = edges_box[0]

    nodes = cust.select(F.col("c_custkey").alias("node"))
    e_self = edges.unionAll(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    )

    # leg 2 — l1: min over closed neighborhood (the contraction's round 1)
    l1 = e_self.groupBy(F.col("src").alias("node")).agg(F.min("dst").alias("lab"))
    t0 = time.perf_counter()
    l1 = cut(l1)
    legs["l1_groupby"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "rows": n_cust,
    }
    print(f"l1_groupby: {legs['l1_groupby']}", flush=True)
    n_labels = leg(
        "l1_distinct_labels", lambda: l1.select("lab").distinct().count()
    )

    # leg 3 — contraction: edge set relabeled through l1, deduped
    contracted = (
        e_self.join(
            l1.withColumnRenamed("node", "src").withColumnRenamed("lab", "src_lab"),
            "src",
        )
        .join(
            l1.withColumnRenamed("node", "dst").withColumnRenamed("lab", "dst_lab"),
            "dst",
        )
        .select(F.col("src_lab").alias("src"), F.col("dst_lab").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    t0 = time.perf_counter()
    contracted = cut(contracted)
    n_contracted = contracted.count()
    legs["contraction"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "rows": n_contracted,
    }
    print(f"contraction: {legs['contraction']}", flush=True)

    # leg 4 — fixpoint over the contracted graph + map back (skipped when
    # the contraction is empty, the common blocked-entity case)
    rounds = 0
    if n_contracted > 0:
        label_nodes = l1.select(F.col("lab").alias("node")).distinct()
        t0 = time.perf_counter()
        comp = min_label_components(
            label_nodes, contracted, iterations=16, until_converged=True
        ).withColumnRenamed("node", "lab")
        n_final = l1.join(comp, "lab").count()
        legs["fixpoint_mapback"] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "rows": n_final,
        }
        print(f"fixpoint_mapback: {legs['fixpoint_mapback']}", flush=True)

    payload = {
        "metric": "q39_leg_decomposition",
        "sf_dir": sf_dir,
        "block_cap": block_cap,
        "n_customer": n_cust,
        "n_blocks": int(blocks),
        "analytic_candidate_pairs": int(analytic_pairs),
        "distinct_l1_labels": int(n_labels),
        "contracted_edges": int(n_contracted),
        "fixpoint_rounds_bound": rounds,
        "legs": legs,
        "total_leg_wall_s": round(sum(v["wall_s"] for v in legs.values()), 3),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
