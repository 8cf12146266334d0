#!/bin/bash
# Round-9 campaign C: streaming-harness floor attribution (verdict item
# 5) + medallion pipeline at 1x/10x/100x reference scale (item 6).
set -x
cd /root/repo

SQ=q111_streaming_dedup_watermark,q115_stream_stream_join,q129_streaming_sliding
python scripts/bench_scaling_fresh.py /root/testdata/sf0.01 $SQ 3 /tmp/r9_fresh_sf001_stream.json >/dev/null 2>/tmp/r9_c1.log
python scripts/bench_scaling_fresh.py /root/testdata/sf0.1 $SQ 3 /tmp/r9_fresh_sf01_stream.json >/dev/null 2>/tmp/r9_c2.log

python scripts/bench_pipeline_scale.py /tmp/r9_pipeline_scale.json 1 10 100 >/dev/null 2>/tmp/r9_c3.log
echo CAMPAIGN_C_DONE
