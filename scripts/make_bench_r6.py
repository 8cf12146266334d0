"""Merge the round-6 re-measurement campaigns into the scaling artifacts.

Round-5's judge flagged three sf10 rows as weather-contaminated
(spread > median: q42f 209.8/98.1, q133 170.0/195.2, q39 200.2/379.4)
and two families as anchor-less (q159/q160 had no DuckDB rows at any
scale above sf0.1). Inputs, all produced by fresh-process interleaved
passes (scripts/bench_scaling_fresh.py — one JVM per SAMPLE, so
accumulated checkpoint blocks can't tax later queries, and pass 0 runs
every query before pass 1, so a host transient hits one PASS, not one
query's every sample; the shared-session control run that motivated
this is recorded in SCALING.md round-6):

  /tmp/r6_sf10_heavy_fresh.json  bench_scaling_fresh @ testdata_sf10
                                 (q42f, q133, q39, q144; 3 passes)
  /tmp/r6_sf10_wide_spark.json   bench_scaling_fresh @ testdata_sf10
                                 (q151-q156, q159, q160; 3 passes)
  /tmp/r6_sf1_fresh.json         bench_scaling_fresh @ testdata_sf1
                                 (the four heavy rows' sf1 BASES were
                                 contaminated too — q39 spread 32.7 on
                                 median 29.7, q42f 10.7 on 5.1 — and
                                 growth = sf10/sf1 needs both ends
                                 clean; plus q159/q160 first sf1 rows)
  /tmp/r6_sf1_ann_duck.json      bench_duckdb.py @ testdata_sf1
  /tmp/r6_sf10_duck.json         bench_duckdb.py @ testdata_sf10
                                 (capped: quadratic oracles time out)

Output: BENCH_sf10.json rows replaced/added with {sf10, spread_sf10,
duck_sf10, growth} recomputed; BENCH_sf1.json gains q159/q160 rows.
Rows replaced by this script carry "r6_remeasure": true.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    heavy = _load("/tmp/r6_sf10_heavy_fresh.json")
    wide = _load("/tmp/r6_sf10_wide_spark.json")
    sf1_fresh = _load("/tmp/r6_sf1_fresh.json")
    sf1_duck = _load("/tmp/r6_sf1_ann_duck.json").get("queries", {})
    sf10_duck = _load("/tmp/r6_sf10_duck.json").get("queries", {})

    sf10_path = os.path.join(ROOT, "BENCH_sf10.json")
    sf1_path = os.path.join(ROOT, "BENCH_sf1.json")
    b10 = _load(sf10_path)
    b1 = _load(sf1_path)

    new_sf10 = {**heavy.get("queries", {}), **wide.get("queries", {})}
    spread_sf10 = {**heavy.get("spread", {}), **wide.get("spread", {})}
    samples_sf10 = {**heavy.get("samples", {}), **wide.get("samples", {})}

    for name, sec in new_sf10.items():
        row = b10["queries"].get(name, {})
        # sf1 base: prefer the round-6 fresh-process measurement; fall
        # back to the existing (r5 shared-session) row where the fresh
        # campaign didn't cover the query.
        base = sf1_fresh.get("queries", {}).get(name) or row.get("sf1")
        if name in sf1_fresh.get("queries", {}):
            row["spread_sf1"] = sf1_fresh.get("spread", {}).get(name)
            row["samples_sf1"] = sf1_fresh.get("samples", {}).get(name)
        row.update(
            {
                "sf10": sec,
                "spread_sf10": spread_sf10.get(name),
                "samples_sf10": samples_sf10.get(name),
                "sf1": base,
                "growth": round(sec / base, 2) if base else None,
                "duck_sf10": sf10_duck.get(name),
                "r6_remeasure": True,
            }
        )
        if name in sf1_duck and not row.get("duck_sf1"):
            row["duck_sf1"] = sf1_duck[name]
        b10["queries"][name] = row

    b10["round6_note"] = (
        "r6 rows (r6_remeasure) are fresh-process-per-sample interleaved "
        "3-pass medians replacing the r5 rows whose spread exceeded their "
        "median (q42f/q133/q39 — the judge's weather flag), plus first "
        "sf10 artifacts for q151-q156 and q159/q160 with DuckDB "
        "anchors where the oracle finishes under the per-query cap."
    )

    for name, sec in sf1_fresh.get("queries", {}).items():
        row = b1["queries"].get(name, {})
        row.update(
            {
                "sf1": sec,
                "spread_sf1": sf1_fresh.get("spread", {}).get(name),
                "samples_sf1": sf1_fresh.get("samples", {}).get(name),
                "r6_remeasure": True,
            }
        )
        if name in sf1_duck:
            row["duck_sf1"] = sf1_duck[name]
        row.setdefault("sf01", None)
        b1["queries"][name] = row
        # growth in the sf1 artifact is sf1/sf01 — recompute only when
        # both ends exist
        if row.get("sf01"):
            row["growth"] = round(sec / row["sf01"], 2)

    with open(sf10_path, "w") as f:
        json.dump(b10, f, indent=1, sort_keys=True)
    with open(sf1_path, "w") as f:
        json.dump(b1, f, indent=1, sort_keys=True)
    print("updated", sf10_path, "and", sf1_path)


if __name__ == "__main__":
    main()
