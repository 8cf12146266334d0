#!/bin/bash
# Round-9 campaign A2: q162p decade evidence (Spark fresh-process +
# DuckDB at four scales).
set -x
cd /root/repo
Q=q162p_sq8_ann_scalable
python scripts/bench_scaling_fresh.py /root/testdata/sf0.1 $Q 5 /tmp/r9_fresh_sf01_q162p.json >/dev/null 2>/tmp/r9_a21.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf1 $Q 5 /tmp/r9_fresh_sf1_q162p.json >/dev/null 2>/tmp/r9_a22.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf10 $Q 3 /tmp/r9_fresh_sf10_q162p.json >/dev/null 2>/tmp/r9_a23.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf100emb $Q 3 /tmp/r9_fresh_sf100_q162p.json >/dev/null 2>/tmp/r9_a24.log
export SPARK_GRAFT_DUCK_QUERY_CAP=300
SPARK_GRAFT_BENCH_QUERIES=$Q SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf01_q162p.json python scripts/bench_duckdb.py /root/testdata/sf0.1 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$Q SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf1_q162p.json python scripts/bench_duckdb.py /root/repo/testdata_sf1 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$Q SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf10_q162p.json python scripts/bench_duckdb.py /root/repo/testdata_sf10 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$Q SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf100_q162p.json python scripts/bench_duckdb.py /root/repo/testdata_sf100emb >/dev/null 2>&1
echo CAMPAIGN_A2_DONE
