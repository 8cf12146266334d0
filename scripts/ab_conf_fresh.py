"""Fresh-process-per-sample conf A/B (round 11): time one registry
query under two conf settings, each sample its own subprocess (zero
carried JVM state — the only valid instrument for heavy sf10 queries,
see SCALING.md round-6 method note), interleaved passes, noop sink,
warm-second-run rule under 60 s.

Usage:
  python scripts/ab_conf_fresh.py QUERY SF_DIR "CONF=VAL[;CONF=VAL]" [passes]

The A side is the library default (no conf set); the B side applies the
given conf assignments after session tuning.
"""

from __future__ import annotations

import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {root!r})
from ipes_data_pipeline_spark.session import get_session
spark = get_session("ab-conf-fresh")
spark.sparkContext.setLogLevel("ERROR")
for kv in {confs!r}:
    if kv:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
from ipes_data_pipeline_spark.queries import REGISTRY, load_all
load_all()
spark.read.parquet({sf_dir!r} + "/nation.parquet").count()
t0 = time.perf_counter()
df = REGISTRY[{name!r}].spark(spark, {sf_dir!r})
df.write.mode("overwrite").format("noop").save()
t1 = time.perf_counter() - t0
if t1 < float(os.environ.get("SPARK_GRAFT_WARM_CUTOFF", "60")):
    from ipes_data_pipeline_spark.operators.util import release_spills
    del df
    release_spills(spark)
    t0 = time.perf_counter()
    df = REGISTRY[{name!r}].spark(spark, {sf_dir!r})
    df.write.mode("overwrite").format("noop").save()
    print("SAMPLE_SEC=%.3f WARM=1 FIRST=%.3f" % (time.perf_counter() - t0, t1))
else:
    print("SAMPLE_SEC=%.3f WARM=0" % t1)
"""


def main() -> None:
    name, sf_dir, conf_str = sys.argv[1], sys.argv[2], sys.argv[3]
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sides = {"default": [], "conf": conf_str.split(";")}
    samples: dict[str, list[float]] = {k: [] for k in sides}
    firsts: dict[str, list[float]] = {k: [] for k in sides}
    for p in range(passes):
        for label, confs in sides.items():
            proc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    CHILD.format(root=ROOT, confs=confs, sf_dir=sf_dir, name=name),
                ],
                capture_output=True,
                text=True,
            )
            hit = re.search(r"SAMPLE_SEC=([0-9.]+)", proc.stdout)
            if not hit:
                print(
                    f"pass {p} {label}: FAILED\n{proc.stderr[-2000:]}",
                    file=sys.stderr,
                )
                continue
            samples[label].append(float(hit.group(1)))
            f = re.search(r"FIRST=([0-9.]+)", proc.stdout)
            firsts[label].append(float(f.group(1)) if f else float(hit.group(1)))
            print(f"pass {p} {label}: {hit.group(1)}s", file=sys.stderr, flush=True)
    for label, ts in samples.items():
        if not ts:
            print(f"{name} [{label}]: NO SAMPLES")
            continue
        print(
            f"{name} [{label} {';'.join(sides[label]) or 'library'}]: "
            f"median {statistics.median(ts):.2f}  "
            f"runs [{' '.join(f'{t:.2f}' for t in ts)}]  "
            f"firsts [{' '.join(f'{t:.2f}' for t in firsts[label])}]"
        )


if __name__ == "__main__":
    main()
