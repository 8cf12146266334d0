"""A/B AQE initialPartitionNum for a set of queries (round-11, VERDICT
item 1 bisect): run each query through the noop sink under two settings
of spark.sql.adaptive.coalescePartitions.initialPartitionNum — the
adaptive derivation's value vs the legacy constant 256 — interleaved
passes, one session (the conf is runtime-settable and read at planning
time, so flipping it between runs is a valid A/B).

Usage: python scripts/ab_initial_partitions.py QUERY [QUERY ...] [--runs N]
           [--values V1,V2,...]   (default: adaptive derivation vs 256)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.session import get_session


def main() -> None:
    argv = sys.argv[1:]
    runs = 5
    values: list[str] | None = None
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    if "--values" in argv:
        i = argv.index("--values")
        values = argv[i + 1].split(",")
        del argv[i : i + 2]
    args = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_session("ab-initpart")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    conf = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    adaptive = spark.conf.get(conf)
    settings = (
        [(f"init{v}", v) for v in values]
        if values
        else [("adaptive", adaptive), ("const256", "256")]
    )
    import gc

    samples: dict[tuple[str, str], list[float]] = {}
    for r in range(runs):
        for name in args:
            for label, value in settings:
                spark.conf.set(conf, value)
                spark.sparkContext.setJobDescription(
                    f"{name} {label}={value} pass {r}"
                )
                t0 = time.perf_counter()
                df = REGISTRY[name].spark(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                samples.setdefault((name, f"{label}={value}"), []).append(
                    time.perf_counter() - t0
                )
                del df
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(0.2)
    spark.conf.set(conf, adaptive)
    for (name, label), ts in samples.items():
        print(
            f"{name} [{label}]: median {statistics.median(ts):.3f}  "
            f"runs [{' '.join(f'{t:.2f}' for t in ts)}]"
        )


if __name__ == "__main__":
    main()
