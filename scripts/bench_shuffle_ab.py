"""A/B the shuffle-partition lever on the sf10 shuffle-spill class.

SCALING.md's sf1->sf10 decade found exactly three superlinear Spark
plans — q39 fuzzy dedup (12.8x), q42f MinHash (19.3x), q133 hybrid
near-dup (29.6x) — all wide-intermediate shuffle plans (exploded
shingle/band rows) whose per-partition bytes grew 10x because
``spark.sql.shuffle.partitions`` stayed pinned at 32. The cluster-
idiomatic fix is not a bigger pinned number but AQE's two-sided lever:
start every exchange at a high ``initialPartitionNum`` and let
coalescing shrink small stages back down (``parallelismFirst`` keeps
tiny workloads at default parallelism, so sf0.1 pays nothing).

This script measures that lever same-session at sf10: each pass runs
all three queries under pinned-32 semantics (initialPartitionNum=32,
i.e. today's behavior) then under initialPartitionNum=N (default 256).
Interleaved passes so box-level drift hits a pass, not a config.

Usage:
  python scripts/bench_shuffle_ab.py [sf_dir] [runs] [initialN]
Writes /tmp/shuffle_ab.json and prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.session import get_session

QUERIES = ["q39_fuzzy_dedup", "q42f_dedup_minhash_fast", "q133_hybrid_neardup"]
CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    initial_n = sys.argv[3] if len(sys.argv) > 3 else "256"
    load_all()
    spark = get_session("shuffle-ab")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    configs = {"pinned32": "32", f"initial{initial_n}": initial_n}
    samples: dict[str, dict[str, list[float]]] = {
        c: {q: [] for q in QUERIES} for c in configs
    }
    for r in range(runs):
        for cname, n in configs.items():
            spark.conf.set(CONF, n)
            for q in QUERIES:
                t0 = time.perf_counter()
                df = REGISTRY[q].spark(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                samples[cname][q].append(dt)
                print(
                    f"# pass {r} {cname} {q}: {dt:.1f}s", file=sys.stderr, flush=True
                )
                del df
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(0.3)
    out = {
        "metric": "shuffle_partition_ab_sf10",
        "unit": "sec",
        "runs": runs,
        "sf_dir": sf_dir,
        "conf": CONF,
        "queries": {
            q: {
                c: {
                    "median": round(statistics.median(samples[c][q]), 3),
                    "min": round(min(samples[c][q]), 3),
                    "max": round(max(samples[c][q]), 3),
                }
                for c in configs
            }
            for q in QUERIES
        },
    }
    with open("/tmp/shuffle_ab.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
