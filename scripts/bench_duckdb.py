"""Time the headline queries' oracle SQL in DuckDB (32 threads) at sf0.1.

The honest single-node comparison for BASELINE.md: identical algorithms,
identical parquet inputs, DuckDB's vectorized engine vs our Spark plans.
Queries without oracle SQL (streaming, learned-centroid ANN) are skipped.

Usage: python scripts/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from ipes_data_pipeline_spark.queries import REGISTRY, TABLES, load_all


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all()
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    headline = (
        [q for q in subset_env.split(",") if q] if subset_env else HEADLINE
    )
    timings: dict[str, float] = {}
    for name in headline:
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
