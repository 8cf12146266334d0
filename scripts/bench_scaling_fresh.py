"""Fresh-process-per-sample scaling bench — the round-6 weather fix.

Round 5's sf10 heavy-dedup rows had spread > median (q42f 209.8/98.1,
q133 170.0/195.2, q39 200.2/379.4) and the round-6 shared-session
re-run REPRODUCED it (q144: median 15 s, spread 42 s — a query that
runs 11 s in a fresh session). The instrument error is the shared
long-lived session, not only host weather: accumulated localCheckpoint
blocks from earlier heavy queries (q39's edge sets, q133's band
tables) raise JVM GC pressure for everything after them — the exact
effect SCALING.md's round-5 method note measured (q155: 33 s
mid-batch vs 6.0 s fresh, same plan).

Method here: every SAMPLE is its own subprocess (fresh JVM, zero
carried blocks); passes interleave across queries (pass 0 runs every
query once, then pass 1, ...) so a host-weather transient hits one
pass, not one query's every sample. The OS page cache stays warm
across processes — deliberately: these rows measure compute, not cold
IO. JVM startup is excluded (timed region = query build + noop write,
inside the child). Samples under 60 s report a WARM second run
(first-run codegen/JIT tax is ~5-9 s on this box — negligible against
a 200 s heavy, dominant against a 1 s query and a growth-ratio
distorter); the per-sample first-run times ride along in
``first_runs`` for transparency.

Usage:
  python scripts/bench_scaling_fresh.py SF_DIR Q1,Q2,... [passes] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {root!r})
# the SAME session factory bench.py uses (48g heap, tuned confs) — a
# smaller ad-hoc heap changes GC behavior and OOMs q39 at sf10
from ipes_data_pipeline_spark.session import get_session
spark = get_session("scaling-fresh")
spark.sparkContext.setLogLevel("ERROR")
from ipes_data_pipeline_spark.queries import REGISTRY, load_all
load_all()
spark.read.parquet({sf_dir!r} + "/nation.parquet").count()  # JVM+fs warm
t0 = time.perf_counter()
df = REGISTRY[{name!r}].spark(spark, {sf_dir!r})
df.write.mode("overwrite").format("noop").save()
t1 = time.perf_counter() - t0
# Steady-state rule: a fresh JVM charges the FIRST run ~5-9 s of
# codegen/JIT warmup, which swamps cheap queries (q144 at sf1: 10.7 s
# first run vs 1.2 s steady-state) and deflates growth ratios whose
# sf1 base it inflates. When the first run is cheap, time a second,
# warm run and report that; past 60 s the tax is <3 percent of the
# sample and a second run would double the campaign for nothing.
if t1 < 60.0:
    t0 = time.perf_counter()
    df = REGISTRY[{name!r}].spark(spark, {sf_dir!r})
    df.write.mode("overwrite").format("noop").save()
    print("SAMPLE_SEC=%.3f WARM=1 FIRST=%.3f" % (time.perf_counter() - t0, t1))
else:
    print("SAMPLE_SEC=%.3f WARM=0" % t1)
"""


def main() -> None:
    sf_dir = sys.argv[1]
    names = [q for q in sys.argv[2].split(",") if q]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scaling_fresh.json"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    samples: dict[str, list[float]] = {n: [] for n in names}
    first_runs: dict[str, list[float]] = {n: [] for n in names}
    for p in range(passes):
        for name in names:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD.format(root=ROOT, sf_dir=sf_dir, name=name)],
                capture_output=True,
                text=True,
            )
            hit = re.search(r"SAMPLE_SEC=([0-9.]+)", proc.stdout)
            if not hit:
                print(f"pass {p} {name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
                continue
            sec = float(hit.group(1))
            samples[name].append(sec)
            first = re.search(r"FIRST=([0-9.]+)", proc.stdout)
            first_runs[name].append(float(first.group(1)) if first else sec)
            print(f"pass {p} {name}: {sec:.2f}s", file=sys.stderr)
            # partial flush so an interrupted campaign keeps its samples
            _flush(out_path, sf_dir, m, passes, samples, first_runs)
    _flush(out_path, sf_dir, m, passes, samples, first_runs)
    with open(out_path) as f:
        print(f.read())


def _flush(out_path, sf_dir, m, passes, samples, first_runs) -> None:
    done = {n: ts for n, ts in samples.items() if ts}
    payload = {
        "metric": "fresh_process_scaling",
        "unit": "sec",
        "sf": float(m.group(1)) if m else None,
        "sf_dir": sf_dir,
        "passes": passes,
        "method": (
            "fresh JVM per sample, interleaved passes, noop sink; "
            "samples <60s are warm 2nd runs (first runs in first_runs)"
        ),
        "queries": {n: round(statistics.median(ts), 3) for n, ts in done.items()},
        "spread": {n: round(max(ts) - min(ts), 3) for n, ts in done.items()},
        "samples": {n: [round(x, 3) for x in ts] for n, ts in done.items()},
        "first_runs": {
            n: [round(x, 3) for x in ts]
            for n, ts in first_runs.items()
            if ts
        },
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
