"""One-pass smoke timing of EVERY registered query at sf0.01.

VERDICT r4 #8: 66 of 152 declared queries are benched at sf0.1; q121
(6.2 s) hid in the other 86 for two rounds. This sweep times all of
them once at driver-correctness scale and flags any query slower than
3x its family median — the tripwire for quietly-superlinear registry
entries that never reach the headline bench.

Usage: python scripts/bench_all_smoke.py [sf_dir] [out_json]
Writes BENCH_ALL_SMOKE.json: {"sf_dir", "timings": {...}, "families":
{family: median}, "outliers": [{"query", "sec", "family_median"}]}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.session import get_session


def family_of(name: str, desc: str) -> str:
    """Coarse family = the description's leading tag (e.g. 'dedup',
    'curation', 'STREAMING') — the grouping SCALING.md reasons in."""
    head = desc.split(":", 1)[0].strip().lower()
    return head if len(head) <= 24 else "misc"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ALL_SMOKE.json",
    )
    load_all()
    spark = get_session("bench-all-smoke")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    import gc

    timings: dict[str, float] = {}
    fams: dict[str, str] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        fams[name] = family_of(name, spec.family)
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        del df
        gc.collect()

    fam_groups: dict[str, list[float]] = {}
    for name, sec in timings.items():
        fam_groups.setdefault(fams[name], []).append(sec)
    fam_median = {
        f: round(statistics.median(v), 3) for f, v in fam_groups.items()
    }
    outliers = [
        {
            "query": name,
            "sec": sec,
            "family": fams[name],
            "family_median": fam_median[fams[name]],
        }
        for name, sec in timings.items()
        if len(fam_groups[fams[name]]) >= 3
        and sec > 3 * fam_median[fams[name]]
        and sec > 1.0  # sub-second entries are fixture floor, not risk
    ]
    outliers.sort(key=lambda o: -o["sec"])
    result = {
        "sf_dir": sf_dir,
        "n_queries": len(timings),
        "total_sec": round(sum(timings.values()), 3),
        "timings": timings,
        "family_medians": fam_median,
        "outliers": outliers,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "n_queries": len(timings),
                "total_sec": result["total_sec"],
                "n_outliers": len(outliers),
                "outliers": [o["query"] for o in outliers],
                "out": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
