"""Assemble BENCH_sf10.json — the sf1 → sf10 (second) scaling decade.

Inputs are serial /tmp runs over the 14-query heavy-family subset
(q114 brute-force kNN is excluded by design at sf10: its broadcast-
regime guard trips at 200k vectors, which is the guard working):

  /tmp/sf10_spark.json  bench.py @ testdata_sf10  (3-run medians)
  /tmp/sf1_spark.json   bench.py @ testdata_sf1   (3-run medians,
                        reused from the BENCH_sf1.json campaign)
  /tmp/sf10_duck.json   bench_duckdb.py @ testdata_sf10 (optional /
                        partial: quadratic oracle SQL may time out)
  /tmp/sf1_duck.json    bench_duckdb.py @ testdata_sf1

Output: BENCH_sf10.json with per-query {sf1, sf10, growth, duck_*}.
Together with BENCH_sf1.json this gives a measured two-decade curve
(sf0.1 → sf1 → sf10, 100x rows end to end) for the scaling claims in
SCALING.md.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_sf10.json",
)


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    s10 = _load("/tmp/sf10_spark.json")
    s1 = _load("/tmp/sf1_spark.json")
    d10 = _load("/tmp/sf10_duck.json").get("queries", {})
    d1 = _load("/tmp/sf1_duck.json").get("queries", {})
    qs = {}
    for name, sec in s10.get("queries", {}).items():
        base = s1.get("queries", {}).get(name)
        row = {
            "sf10": sec,
            "sf1": base,
            "growth": round(sec / base, 2) if base else None,
            "spread_sf10": s10.get("spread", {}).get(name),
            "spread_sf1": s1.get("spread", {}).get(name),
        }
        if name in d10 or name in d1:
            row["duck_sf10"] = d10.get(name)
            row["duck_sf1"] = d1.get(name)
            if d10.get(name) and d1.get(name):
                row["duck_growth"] = round(d10[name] / d1[name], 2)
        qs[name] = row
    out = {
        "metric": "sf1_to_sf10_scaling",
        "unit": "sec",
        "runs": s10.get("runs"),
        "rows_multiplier": 10,
        "sf10_dir": s10.get("sf_dir"),
        "sf1_dir": s1.get("sf_dir"),
        "total_sf10": s10.get("value"),
        "total_sf1": s1.get("value"),
        "queries": qs,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"out": OUT, "n": len(qs)}))


if __name__ == "__main__":
    main()
