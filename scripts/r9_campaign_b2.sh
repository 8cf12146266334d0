#!/bin/bash
# Round-9 campaign B2: decompose re-runs with leg-1 (blocked join +
# levenshtein) timed correctly (the first cut constructed candidate_pairs
# outside the timer; its eager localCheckpoint hid the dominant leg).
set -x
cd /root/repo
python scripts/decompose_q39.py /root/testdata/sf0.1 none /tmp/r9_q39dec_sf01.json >/tmp/r9_b21.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf1 none /tmp/r9_q39dec_sf1.json >/tmp/r9_b22.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf1 256 /tmp/r9_q39dec_sf1_cap.json >/tmp/r9_b23.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf10 none /tmp/r9_q39dec_sf10.json >/tmp/r9_b24.log 2>&1
python scripts/decompose_q39.py /root/repo/testdata_sf10 256 /tmp/r9_q39dec_sf10_cap.json >/tmp/r9_b25.log 2>&1
echo CAMPAIGN_B2_DONE
