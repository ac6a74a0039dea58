#!/bin/bash
# Round-12 1000x registry-tail sweep launcher (tmux-run; resumable).
# 220 oracled queries that had 100x as their top rung, light-table
# members first, via probe_correctness.py against the standing
# /tmp/fcs_scale1000 directory with the r11 watchdog/mem-cap knobs.
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
export SPARK_GRAFT_PROBE_QUERIES=$(cat /tmp/tail1000_ordered.txt)
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/sweep1000tail_r12.jsonl
export SPARK_GRAFT_PROBE_RESUME=1
export SPARK_GRAFT_PROBE_TIMEOUT_S=600
export SPARK_GRAFT_PROBE_DUCKDB_MEM=28GB
export SPARK_GRAFT_PROBE_DUCKDB_TMP=/tmp/fcs_duck_tmp
python probe_correctness.py
echo "RC=$?"
