#!/bin/bash
# Round-13 batch A: driver-identical 1000x comparison for the three
# round-13 DECIMAL conversions (revenue_share_hierarchy is the r12
# standing FAIL; window_running_frames and abc_xyz_classification are
# the follow-up grep's conversions — their oracles were TIMEOUT-class
# at 600 s in r12, so this run carries the longer 1800 s cap).
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
export SPARK_GRAFT_PROBE_QUERIES=revenue_share_hierarchy,abc_xyz_classification,window_running_frames
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/sweep1000_r13.jsonl
export SPARK_GRAFT_PROBE_RESUME=1
export SPARK_GRAFT_PROBE_TIMEOUT_S=1800
export SPARK_GRAFT_PROBE_DUCKDB_MEM=28GB
export SPARK_GRAFT_PROBE_DUCKDB_TMP=/tmp/fcs_duck_tmp_a
python probe_correctness.py
echo "BATCHA_RC=$?"
