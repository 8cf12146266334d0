"""Medallion pipeline e2e at 1x / 10x / 100x the reference's scale.

bench.py times `run_pipeline` at reference scale only (~800 raw
filings — the scale the reference's published 0.86-1.11 s structure
stage ran at). Round-8 verdict stretch item: close the PIPELINE scale
story (not just the query scale story) by driving the same medallion
DAG at 100x bronze volume and recording per-stage walls.

Fixture: RAW_FILINGS cycled with a per-copy entity rename that keeps
every classify/normalize/dedup branch live while making entities
DISTINCT across copies — the first name token gets the copy index
appended ("Stratus Network, LLC" -> "Stratus00042 Network, LLC"), so:
  - intra-copy near-dup pairs stay near-dups (same edit distance,
    same first-token block);
  - cross-copy entities never collide (no degenerate 4000-row
    mega-entity whose dedup would measure skew, not scale);
  - token counts are unchanged, so the individual-detection gate
    (<=3 tokens) and every keyword branch fire exactly as at 1x.
Submission ids get the copy suffix too (they're the bronze key).

Each scale runs in a FRESH subprocess (fresh JVM — the
bench_scaling_fresh lesson; a shared session's accumulated state
pollutes later samples).

Usage: python scripts/bench_pipeline_scale.py [out.json] [scales...]
  default scales: 1 10 100  (copies of the 20-row fixture: 40/400/4000)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {root!r})
from ipes_data_pipeline_spark.session import get_session
from ipes_data_pipeline_spark.pipeline.run import run_pipeline
from tests.fixtures import RAW_FILINGS

mult = {mult}
copies = 40 * mult  # 40 copies == bench.py's ~800-row reference scale

def renamed(rec, i):
    tag = "%05d" % i
    out = json.loads(json.dumps(rec))  # deep copy
    out["id_submission"] = f"{{out['id_submission']}}-{{i}}"
    for key in ("filers", "authors", "lawfirms"):
        for ent in out.get(key) or []:
            name = ent.get("name")
            if name:
                head, sep, tail = name.partition(" ")
                ent["name"] = head + tag + sep + tail
    return out

work = tempfile.mkdtemp(prefix="bench_e2e_scale_")
try:
    raw_dir = os.path.join(work, "raw")
    os.makedirs(raw_dir)
    with open(os.path.join(raw_dir, "filings.jsonl"), "w") as f:
        n = 0
        for i in range(copies):
            for rec in RAW_FILINGS:
                f.write(json.dumps(renamed(rec, i)) + "\n")
                n += 1
    spark = get_session("bench-pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    res = run_pipeline(spark, raw_dir, os.path.join(work, "lake"), stats=False)
    wall = round(time.perf_counter() - t0, 3)
    print("RESULT=" + json.dumps({{
        "mult": mult,
        "raw_rows": n,
        "e2e_s": wall,
        "steps": res.step_durations,
        "companies": res.companies.count(),
        "filings": res.filings.count(),
        "gold": res.gold.count() if res.gold is not None else None,
    }}))
finally:
    shutil.rmtree(work, ignore_errors=True)
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_pipeline_scale.json"
    scales = [int(x) for x in sys.argv[2:]] or [1, 10, 100]
    rows = []
    for mult in scales:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(root=ROOT, mult=mult)],
            capture_output=True,
            text=True,
        )
        hit = re.search(r"RESULT=(\{.*\})", proc.stdout)
        if not hit:
            print(f"mult {mult}: FAILED\n{proc.stderr[-3000:]}", file=sys.stderr)
            continue
        rec = json.loads(hit.group(1))
        rows.append(rec)
        print(f"mult {mult}: {rec}", file=sys.stderr)
        payload = {
            "metric": "pipeline_e2e_scaling",
            "unit": "sec",
            "fixture": "RAW_FILINGS x 40 x mult, per-copy entity rename",
            "scales": rows,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    with open(out_path) as f:
        print(f.read())


if __name__ == "__main__":
    main()
