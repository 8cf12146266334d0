#!/bin/bash
# Round-9 campaign B: q39/q39p growth decomposition (verdict item 2).
# Leg decomposition per scale (fresh process each) + clean 5-pass fresh
# q39/q39p medians at sf1 and 3-pass at sf10.
set -x
cd /root/repo

python scripts/decompose_q39.py /root/testdata/sf0.1 none /tmp/r9_q39dec_sf01.json >/tmp/r9_b1.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf1 none /tmp/r9_q39dec_sf1.json >/tmp/r9_b2.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf1 256 /tmp/r9_q39dec_sf1_cap.json >/tmp/r9_b3.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf10 none /tmp/r9_q39dec_sf10.json >/tmp/r9_b4.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf10 256 /tmp/r9_q39dec_sf10_cap.json >/tmp/r9_b5.log 2>&1

Q=q39_fuzzy_dedup,q39p_fuzzy_dedup_capped
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf1 $Q 5 /tmp/r9_fresh_sf1_q39.json >/dev/null 2>/tmp/r9_b6.log
python scripts/bench_scaling_fresh.py /root/repo/testdata_sf10 $Q 3 /tmp/r9_fresh_sf10_q39.json >/dev/null 2>/tmp/r9_b7.log
echo CAMPAIGN_B_DONE
