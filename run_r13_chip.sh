#!/bin/bash
# Round-13 batch C (verdict item 4): chip the compare-volume TIMEOUTs.
# $1 = shard index (0/1). Two shards max per box (r12 harness lesson),
# each with its own DuckDB pool/temp dir, and a 1800 s per-query cap
# (triple the r12 sweep's 600 s — the named class is "the compare
# volume needs longer", so the longer cap IS the experiment).
set -u
SHARD="$1"
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=20g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
if [ "$SHARD" = "0" ]; then
  # small-output queries whose 600 s timeout was oracle-side agg/rank
  # work over 600M/100M rows — cheapest wins first
  export SPARK_GRAFT_PROBE_QUERIES=mann_whitney_u,simpson_reversal_check,runs_test_randomness,bloom_fpr_calibration,order_backlog_profile,concurrent_sessions_profile,topk_per_group
else
  # the 150M-row-output streamed-compare class
  export SPARK_GRAFT_PROBE_QUERIES=window_lag_lead,window_ranking,math_funcs,map_funcs,unpivot_stack,latest_baseline_join,gap_fill_locf
fi
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/sweep1000chip_r13_s${SHARD}.jsonl
export SPARK_GRAFT_PROBE_RESUME=1
export SPARK_GRAFT_PROBE_TIMEOUT_S=1800
export SPARK_GRAFT_PROBE_DUCKDB_MEM=14GB
export SPARK_GRAFT_PROBE_DUCKDB_TMP=/tmp/fcs_duck_tmp_chip${SHARD}
python probe_correctness.py
echo "CHIP${SHARD}_RC=$?"
