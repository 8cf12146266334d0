#!/bin/bash
# Round-9 campaign A: ANN decade evidence (q162/q166 weak-flag retirement,
# q163p/q168 decade rows) — Spark fresh-process + DuckDB, serially on a
# quiet box.
set -x
cd /root/repo
ANN4=q162_sq8_ann,q166_binary_sign_ann,q163p_rrf_hybrid_ann,q168_ann_topk_batch
ANN3=q162_sq8_ann,q166_binary_sign_ann,q168_ann_topk_batch

python scripts/bench_scaling_fresh.py /root/testdata/sf0.1 $ANN4 5 /tmp/r9_fresh_sf01_ann.json >/dev/null 2>/tmp/r9_a1.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf1 $ANN4 5 /tmp/r9_fresh_sf1_ann.json >/dev/null 2>/tmp/r9_a2.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf10 $ANN4 3 /tmp/r9_fresh_sf10_ann.json >/dev/null 2>/tmp/r9_a3.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf100emb $ANN3 3 /tmp/r9_fresh_sf100_ann.json >/dev/null 2>/tmp/r9_a4.log

export SPARK_GRAFT_DUCK_QUERY_CAP=300
SPARK_GRAFT_BENCH_QUERIES=$ANN4 SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf01_ann.json python scripts/bench_duckdb.py /root/testdata/sf0.1 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$ANN4 SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf1_ann.json python scripts/bench_duckdb.py /root/repo/testdata_sf1 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$ANN4 SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf10_ann.json python scripts/bench_duckdb.py /root/repo/testdata_sf10 >/dev/null 2>&1
SPARK_GRAFT_BENCH_QUERIES=$ANN3 SPARK_GRAFT_DUCK_PARTIAL=/tmp/r9_duck_sf100_ann.json python scripts/bench_duckdb.py /root/repo/testdata_sf100emb >/dev/null 2>&1
echo CAMPAIGN_A_DONE
