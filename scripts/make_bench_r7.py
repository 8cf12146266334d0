"""Merge the round-7 scale-campaign rows (q39p, q161, q162–q166) into
BENCH_sf1.json / BENCH_sf10.json.

Inputs, all produced this round by fresh-process interleaved 3-pass
medians (scripts/bench_scaling_fresh.py) and same-window DuckDB anchors
(scripts/bench_duckdb.py, per-query cap — queries that blow the cap get
``None`` anchors, recorded, like q39's sf10 levenshtein):

  /tmp/r7_sf1.json    Spark @ testdata_sf1
  /tmp/r7_sf10.json   Spark @ testdata_sf10
  /tmp/r7_duck_sf1.json / /tmp/r7_duck_sf10.json  DuckDB anchors

Usage: python scripts/make_bench_r7.py [out_sf1] [out_sf10]
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    out1 = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    out10 = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10.json"
    sp1, sp10 = _load("/tmp/r7_sf1.json"), _load("/tmp/r7_sf10.json")
    du1 = _load("/tmp/r7_duck_sf1.json")
    du10 = _load("/tmp/r7_duck_sf10.json")
    b1, b10 = _load(out1), _load(out10)
    for name in sorted(sp1["queries"]):
        row1 = {
            "sf1": sp1["queries"][name],
            "samples_sf1": sp1["samples"][name],
            "spread_sf1": sp1["spread"][name],
            "duck_sf1": du1["queries"].get(name),
            "r7": True,
        }
        b1["queries"][name] = row1
        sf10_med = sp10["queries"].get(name)
        row10 = dict(row1)
        row10.update(
            {
                "sf10": sf10_med,
                "samples_sf10": sp10["samples"].get(name),
                "spread_sf10": sp10["spread"].get(name),
                "duck_sf10": du10["queries"].get(name),
                "growth": (
                    round(sf10_med / sp1["queries"][name], 2)
                    if sf10_med
                    else None
                ),
            }
        )
        b10["queries"][name] = row10
    note = (
        "r7 rows (r7: true): fresh-process-per-sample interleaved 3-pass "
        "medians for the round-7 queries (q39p capped fuzzy twin, q161 "
        "residual IVFPQ, q162-q166 retrieval stack) with same-window "
        "DuckDB anchors; duck_* None = oracle blew the per-query cap "
        "(q161 at every scale - 16 unrolled Lloyd chains; caps recorded "
        "in the duck artifacts)."
    )
    b1["round7_note"] = note
    b10["round7_note"] = note
    for path, payload in ((out1, b1), (out10, b10)):
        with open(path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    print(f"merged r7 rows into {out1} / {out10}")


if __name__ == "__main__":
    main()
