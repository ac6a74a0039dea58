#!/bin/bash
# Round-12 1000x tail sweep, sharded: $1 = shard index (0/1/2).
# Three disjoint query lists run in parallel tmux windows against the
# same read-only /tmp/fcs_scale1000 directory; each shard has its own
# results JSONL, DuckDB memory cap, and temp dir. Caps are sized so
# 3 Spark heaps + 3 DuckDB pools fit the 128 GiB box.
set -u
SHARD="$1"
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=20g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
export SPARK_GRAFT_PROBE_QUERIES=$(cat /tmp/tailshard${SHARD}.txt)
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/sweep1000tail_r12_s${SHARD}.jsonl
export SPARK_GRAFT_PROBE_RESUME=1
export SPARK_GRAFT_PROBE_TIMEOUT_S=600
export SPARK_GRAFT_PROBE_DUCKDB_MEM=14GB
export SPARK_GRAFT_PROBE_DUCKDB_TMP=/tmp/fcs_duck_tmp_s${SHARD}
python probe_correctness.py
echo "SHARD${SHARD}_RC=$?"
