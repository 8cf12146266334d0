"""Merge the round-9 scale-evidence campaigns into the committed decade
artifacts.

Inputs (written by r9_campaign_{a,a2,b}.sh):
  /tmp/r9_fresh_sf{01,1,10}_ann.json      q162/q166/q163p/q168 fresh medians
  /tmp/r9_fresh_sf100_ann.json            q162/q166/q168 at the emb-only sf100
  /tmp/r9_fresh_sf{01,1,10,100}_q162p.json  the round-9 Arrow SQ8 twin
  /tmp/r9_fresh_sf{1,10}_q39spill.json    clean 5-pass/3-pass q39/q39p walls
                                          (the shipped parquet-spill edge
                                          regime; the pre-spill walls live
                                          in SCALING.md's A/B narrative)
  /tmp/r9_duck_sf{01,1,10,100}_ann.json   DuckDB anchors, same oracle SQL
  /tmp/r9_duck_sf{01,1,10,100}_q162p.json

Outputs:
  BENCH_sf1.json / BENCH_sf10.json — r9 rows replace the stale medians
  (flagged r9: true, samples + duck anchors riding along)
  BENCH_sf100.json — NEW: the embeddings-only third decade (2M vectors),
  the crossover evidence the round-8 verdict asked for on q162/q166.

Usage: python scripts/make_bench_r9.py
"""

from __future__ import annotations

import json


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> None:
    fresh = {
        sf: _load(f"/tmp/r9_fresh_sf{sf}_ann.json") for sf in ("01", "1", "10", "100")
    }
    fresh_p = {
        sf: _load(f"/tmp/r9_fresh_sf{sf}_q162p.json")
        for sf in ("01", "1", "10", "100")
    }
    fresh_q39 = {
        sf: _load(f"/tmp/r9_fresh_sf{sf}_q39spill.json") for sf in ("1", "10")
    }
    duck = {
        sf: {
            **_load(f"/tmp/r9_duck_sf{sf}_ann.json").get("queries", {}),
            **_load(f"/tmp/r9_duck_sf{sf}_q162p.json").get("queries", {}),
        }
        for sf in ("01", "1", "10", "100")
    }

    def samples_of(src: dict, name: str):
        return src.get("samples", {}).get(name)

    def med_of(src: dict, name: str):
        return src.get("queries", {}).get(name)

    # ---- BENCH_sf1.json: sf0.1 -> sf1 decade ----
    b1 = _load("BENCH_sf1.json")
    # ---- BENCH_sf10.json: sf1 -> sf10 decade ----
    b10 = _load("BENCH_sf10.json")

    def update(bench: dict, name: str, lo_key: str, hi_key: str,
               lo_src: dict, hi_src: dict, duck_lo: dict, duck_hi: dict) -> None:
        lo, hi = med_of(lo_src, name), med_of(hi_src, name)
        if lo is None or hi is None:
            return
        row = bench.setdefault("queries", {}).setdefault(name, {})
        row.update(
            {
                lo_key: lo,
                hi_key: hi,
                f"samples_{lo_key}": samples_of(lo_src, name),
                f"samples_{hi_key}": samples_of(hi_src, name),
                "growth": round(hi / lo, 2) if lo else None,
                "r9": True,
            }
        )
        if name in duck_lo:
            row[f"duck_{lo_key}"] = duck_lo[name]
        if name in duck_hi:
            row[f"duck_{hi_key}"] = duck_hi[name]

    ann = [
        "q162_sq8_ann",
        "q162p_sq8_ann_scalable",
        "q163p_rrf_hybrid_ann",
        "q166_binary_sign_ann",
        "q168_ann_topk_batch",
    ]
    for name in ann:
        for src01, src1, src10 in ((fresh, fresh, fresh), (fresh_p,) * 3):
            update(b1, name, "sf01", "sf1", src01["01"], src1["1"],
                   duck["01"], duck["1"])
            update(b10, name, "sf1", "sf10", src1["1"], src10["10"],
                   duck["1"], duck["10"])
    for name in ("q39_fuzzy_dedup", "q39p_fuzzy_dedup_capped"):
        update(b10, name, "sf1", "sf10", fresh_q39["1"], fresh_q39["10"],
               {}, {})

    with open("BENCH_sf1.json", "w") as f:
        json.dump(b1, f, indent=1, sort_keys=True)
    with open("BENCH_sf10.json", "w") as f:
        json.dump(b10, f, indent=1, sort_keys=True)

    # ---- BENCH_sf100.json: the embeddings-only third decade ----
    b100 = {
        "metric": "sf10_to_sf100_scaling_embeddings_only",
        "unit": "sec",
        "note": (
            "sf100 fixture = embeddings table only at 1000x driver scale "
            "(2M x 64-dim vectors, scripts/gen_scale_data.py subset mode); "
            "the ANN family scales with this table alone. Fresh-process "
            "interleaved samples; DuckDB runs the identical oracle SQL."
        ),
        "queries": {},
    }
    for name in ann:
        if name == "q163p_rrf_hybrid_ann":
            continue  # needs documents; not in the emb-only fixture
        src10 = fresh_p if name.startswith("q162p") else fresh
        src100 = fresh_p if name.startswith("q162p") else fresh
        lo, hi = med_of(src10["10"], name), med_of(src100["100"], name)
        if lo is None or hi is None:
            continue
        row = {
            "sf10": lo,
            "sf100": hi,
            "samples_sf100": samples_of(src100["100"], name),
            "growth": round(hi / lo, 2) if lo else None,
        }
        if name in duck["10"]:
            row["duck_sf10"] = duck["10"][name]
        if name in duck["100"]:
            row["duck_sf100"] = duck["100"][name]
            row["ratio_sf100"] = round(hi / duck["100"][name], 2)
        b100["queries"][name] = row
    with open("BENCH_sf100.json", "w") as f:
        json.dump(b100, f, indent=1, sort_keys=True)
    print(json.dumps(b100, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
