"""Pre-commit mirror of the driver's correctness gate at sf0.01.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from ipes_data_pipeline_spark.oracle import check_query
from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all()
    names = sys.argv[2:] or sorted(REGISTRY)
    spark = get_session("check-correctness")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {e}"]
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({dt:.1f}s)" + ("" if not problems else f" {problems}"))
        failures += bool(problems)
    print(f"{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
