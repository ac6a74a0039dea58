#!/bin/bash
# Round-13 batch B (verdict item 3): ENGINE-side-only 1000x answers for
# the six queries whose DuckDB oracle replay died of single-node
# OOM/disk in every r12 attempt. probe_engine1000.py runs just the
# Spark side against the standing 1000x directory and records wall
# time + rows + exchange counts — the r11 graph-family adjudication
# precedent — with per-query exception containment and resume.
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
export SPARK_GRAFT_PROBE_QUERIES=user_event_paths,wasserstein_drift,markov_stationary_distribution,copurchase_degree_distribution,graph_assortativity,column_similarity_matching
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/probe1000_engine_r13.jsonl
python probe_engine1000.py
echo "ENGINESIDE_RC=$?"
