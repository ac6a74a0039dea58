#!/bin/bash
# Round-12 reconciliation batch: re-run, at 1000x, the queries whose
# mid-sweep records do not describe the current repo state —
# - disk-full / OOM harness casualties of the 3-shard run
#   (markov_stationary_distribution, simpson_reversal_check,
#   column_similarity_matching, odds_ratio_table, pacf_durbin_levinson)
# - the round-12 decimal conversions (agg_stats, cohort_ltv_curve),
#   recorded pre-conversion by the long-lived shard processes
# - anova_oneway and cogroup_asof_enrich re-confirmation in one file
#   (already individually re-proven green; recorded here so one JSONL
#   holds the final state of every round-12 re-pended query)
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
export SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000
export SPARK_GRAFT_PROBE_QUERIES=partitioned_scan_pruning,yoy_segment_growth,csv_scan_roundtrip,value_at_risk,zscore_flags,math_funcs,time_weighted_avg,window_ranking,window_running_frames,transition_perplexity,order_backlog_profile,python_datasource_metrics,revenue_share_hierarchy,simpson_reversal_check,user_event_paths,wasserstein_drift,odds_ratio_table,pacf_durbin_levinson,mad_outlier_flags,bloom_prefilter_join,agg_stats,cohort_ltv_curve,anova_oneway,cogroup_asof_enrich
export SPARK_GRAFT_PROBE_RESULTS=/root/repo/sweep1000tail_r12_fixes.jsonl
export SPARK_GRAFT_PROBE_RESUME=1
export SPARK_GRAFT_PROBE_TIMEOUT_S=600
export SPARK_GRAFT_PROBE_DUCKDB_MEM=28GB
export SPARK_GRAFT_PROBE_DUCKDB_TMP=/tmp/fcs_duck_tmp_fix
python probe_correctness.py
echo "FIXES_RC=$?"
