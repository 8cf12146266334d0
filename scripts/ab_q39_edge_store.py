"""A/B: is q39's sf10 superlinearity the levenshtein JOIN or the edge
MATERIALIZATION (localCheckpoint of the 213M-row half edge set)?

Three timed variants over the same blocked candidate join, fresh
process each (run one variant per invocation):

  nostore — count() the raw join output (no cut): pure join + 3-arg
            levenshtein streaming compute.
  store   — candidate_pairs as shipped (cut -> localCheckpoint), i.e.
            compute + block-store write, then count the checkpointed
            half set.
  parquet — write the half edges to a temp parquet instead (columnar,
            compressed, off-heap), then count the re-read.

If nostore << store, the block store is the cliff and the fix is to
restructure how the edge set is persisted/reused, not the join.

Usage: python scripts/ab_q39_edge_store.py SF_DIR {nostore|store|parquet}
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.session import get_session


def main() -> None:
    sf_dir, variant = sys.argv[1], sys.argv[2]
    spark = get_session("ab-q39-store")
    spark.sparkContext.setLogLevel("ERROR")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.count()  # warm fs/JVM
    block = F.substring(F.col("c_name"), 1, 15)

    keyed = cust.select(
        F.col("c_custkey").alias("node"),
        F.col("c_name").alias("name"),
        block.alias("blk"),
    ).withColumn("sub", F.lit(0))
    n_parts = spark.sparkContext.defaultParallelism
    a = keyed.repartition(n_parts).alias("a")
    b = keyed.alias("b")
    lev = F.levenshtein(F.col("a.name"), F.col("b.name"), 2)
    half = (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.sub") == F.col("b.sub"),
                F.col("a.node") < F.col("b.node"),
            ],
        )
        .where((lev >= 0) & (lev <= 2))
        .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
    )

    t0 = time.perf_counter()
    if variant == "nostore":
        n = half.count()
    elif variant == "store":
        from ipes_data_pipeline_spark.operators.util import cut

        n = cut(half).count()
    elif variant == "parquet":
        work = tempfile.mkdtemp(prefix="ab_q39_")
        try:
            half.write.mode("overwrite").parquet(f"{work}/half")
            n = spark.read.parquet(f"{work}/half").count()
        finally:
            shutil.rmtree(work, ignore_errors=True)
    else:
        raise SystemExit(f"unknown variant {variant}")
    print(
        f"VARIANT={variant} SEC={time.perf_counter() - t0:.2f} ROWS={n}",
        flush=True,
    )


if __name__ == "__main__":
    main()
