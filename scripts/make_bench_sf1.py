"""Assemble BENCH_sf1.json — the sf0.1 → sf1 scaling artifact.

Inputs are the four /tmp runs produced serially (never concurrently —
same-box contention inflates spreads) by bench.py and bench_duckdb.py
over the 15-query heavy-family subset at both scales:

  /tmp/sf1_spark.json   bench.py  @ testdata_sf1   (3-run medians)
  /tmp/sf01_spark.json  bench.py  @ testdata/sf0.1 (3-run medians)
  /tmp/sf1_duck.json    bench_duckdb.py @ testdata_sf1 (may be partial:
                        quadratic oracle SQL is allowed to time out)
  /tmp/sf01_duck.json   bench_duckdb.py @ testdata/sf0.1

Output: BENCH_sf1.json at the repo root with per-query
{sf01, sf1, growth, duck_sf01, duck_sf1, duck_growth} plus the subset
totals. `growth` is the scaling verdict column SCALING.md cites: wall
at 10x the rows over wall at 1x.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_sf1.json",
)


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    s1 = _load("/tmp/sf1_spark.json")
    s01 = _load("/tmp/sf01_spark.json")
    d1 = _load("/tmp/sf1_duck.json").get("queries", {})
    d01 = _load("/tmp/sf01_duck.json").get("queries", {})
    qs = {}
    for name, sec in s1.get("queries", {}).items():
        base = s01.get("queries", {}).get(name)
        row = {
            "sf1": sec,
            "sf01": base,
            "growth": round(sec / base, 2) if base else None,
            "spread_sf1": s1.get("spread", {}).get(name),
            "spread_sf01": s01.get("spread", {}).get(name),
        }
        if name in d1 or name in d01:
            row["duck_sf1"] = d1.get(name)
            row["duck_sf01"] = d01.get(name)
            if d1.get(name) and d01.get(name):
                row["duck_growth"] = round(d1[name] / d01[name], 2)
        qs[name] = row
    out = {
        "metric": "sf01_to_sf1_scaling",
        "unit": "sec",
        "runs": s1.get("runs"),
        "rows_multiplier": 10,
        "sf1_dir": s1.get("sf_dir"),
        "sf01_dir": s01.get("sf_dir"),
        "total_sf1": s1.get("value"),
        "total_sf01": s01.get("value"),
        "queries": qs,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"out": OUT, "n": len(qs)}))


if __name__ == "__main__":
    main()
