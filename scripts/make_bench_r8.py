"""Merge the round-8 scale-evidence rows into BENCH_sf1/sf10.json.

Two jobs, both closing round-7 verdict items:

1. q161 DuckDB anchors (verdict item 1): the residual-IVFPQ oracle is
   now CTE-materialized (queries/tpch_shapes._materialize_ctes), so it
   fits the per-query cap at every scale — /tmp/r8_duck_sf1.json and
   /tmp/r8_duck_sf10.json carry the first cross-engine timings for the
   one headline query that had none.
2. q133a / q130 sf10 re-measure (verdict item 3): 5-pass fresh-process
   interleaved samples from /tmp/r8_fresh_sf10.json replace the wide
   r7 rows; minima ride along (min_sf10) because this host's JVM-regime
   lottery makes the minimum the best compute estimate when spread
   stays wide — rows whose spread exceeds 50% of the median get an
   explicit regime_lottery annotation instead of a false precision.

Usage: python scripts/make_bench_r8.py [out_sf1] [out_sf10]
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    out1 = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    out10 = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10.json"
    du1 = _load("/tmp/r8_duck_sf1.json").get("queries", {})
    du10 = _load("/tmp/r8_duck_sf10.json").get("queries", {})
    fresh10 = _load("/tmp/r8_fresh_sf10.json")
    b1, b10 = _load(out1), _load(out10)

    q161 = "q161_ivfpq_residual_ann"
    if q161 in du1 and q161 in b1.get("queries", {}):
        b1["queries"][q161]["duck_sf1"] = du1[q161]
        b1["queries"][q161]["r8_duck_anchor"] = True
    if q161 in b10.get("queries", {}):
        if q161 in du1:
            b10["queries"][q161]["duck_sf1"] = du1[q161]
        if q161 in du10:
            b10["queries"][q161]["duck_sf10"] = du10[q161]
        b10["queries"][q161]["r8_duck_anchor"] = True

    for name, med in fresh10.get("queries", {}).items():
        row = b10.setdefault("queries", {}).setdefault(name, {})
        samples = fresh10["samples"][name]
        spread = fresh10["spread"][name]
        row.update(
            {
                "sf10": med,
                "samples_sf10": samples,
                "spread_sf10": spread,
                "min_sf10": min(samples),
                "r8_remeasure": True,
            }
        )
        sf1 = row.get("sf1")
        if sf1:
            row["growth"] = round(med / sf1, 2)
        if spread > 0.5 * med:
            row["regime_lottery"] = (
                "spread > 50% of median across fresh-process samples — "
                "host JVM-regime lottery (SCALING.md round-6 method "
                "note); min_sf10 is the best compute estimate"
            )

    b10["round8_note"] = (
        "r8: q161 gains its first DuckDB anchors (materialized-CTE "
        "oracle, semantics-identical); q133a/q130 sf10 rows re-measured "
        "at 5 fresh-process passes with minima reported"
    )
    b1["round8_note"] = (
        "r8: q161 duck_sf1 anchor added (materialized-CTE oracle)"
    )
    for path, payload in ((out1, b1), (out10, b10)):
        with open(path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"q161_duck_sf1": du1.get(q161),
                      "q161_duck_sf10": du10.get(q161),
                      "remeasured": sorted(fresh10.get("queries", {}))}))


if __name__ == "__main__":
    main()
