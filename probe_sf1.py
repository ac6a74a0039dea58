"""One-shot sf1 scale probe (round-6 verdict ask #8).

The shipped fixtures stop at sf0.1; this probe manufactures a 10x
(sf1-scale) copy — documents 50k / embeddings 20k / events 1M rows, ids
shifted per replica so key cardinality scales too — runs the round-6
heavy hitters (`duplicate_paragraph_filter`, `kmv_merge_rollup`,
`embedding_index_manifest`) once, and reports wall time + the FINAL
(AQE-decided) exchange/broadcast counts, confirming the deliberately
UNHINTED joins and two-level sketch merges keep sane plans past fixture
scale. Off-bench by design: run manually (`python probe_sf1.py`), record
the numbers in PERF.md.

Replicated text/embeddings mean every paragraph/vector recurs 10x —
a harsher duplicate workload than organic growth, which is the point:
the paragraph filter's segment-frequency join and SemDeDup's pair stage
see maximal hit rates.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SRC = os.environ.get("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))
#: round-6 heavy hitters + one representative per expensive family
#: (near-dup index join, LSH, dedup closure, basket pairs, TPC-H
#: multi-join, as-of sweep, full SQL-expressible reference pipeline).
_DEFAULT_QUERIES = (
    "duplicate_paragraph_filter",
    "kmv_merge_rollup",
    "embedding_index_manifest",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "part_affinity",
    "q21_waiting_suppliers",
    "latest_baseline_join",
    "pipeline_alerts_fallback_oracle",
    "ivf_topk",
    "sessionize",
    # round-9 additions (r8 verdict ask #6): the r8 families — grid
    # cell-bucketed haversine join, BM25 inverted-postings join, mleval
    # bin histograms — plus the two round-9 de-weakened rewrites
    # (broadcast-cutpoint RFM, binned-AUC logistic) at 10x.
    "geo_radius_join",
    "bm25_scores",
    "calibration_report",
    "roc_threshold_sweep",
    "rfm_segments",
    "logistic_churn_baseline",
)
QUERIES = tuple(
    q.strip()
    for q in os.environ.get("SPARK_GRAFT_PROBE_QUERIES", ",".join(_DEFAULT_QUERIES)).split(",")
    if q.strip()
)


def _scale(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from flink_cookbook_spark.catalog import TABLES, load

    sizes = {}
    for name in TABLES:
        df = load(spark, SRC, name)
        if name == "documents":
            n = df.count()
            scaled = df
            for i in range(1, COPIES):
                scaled = scaled.unionByName(
                    df.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
                )
        elif name == "embeddings":
            n = df.count()
            scaled = df
            for i in range(1, COPIES):
                scaled = scaled.unionByName(
                    df.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
                )
        elif name == "events":
            n_ev = df.count()
            n_users = df.agg(F.max("user_id")).collect()[0][0] + 1
            scaled = df
            for i in range(1, COPIES):
                scaled = scaled.unionByName(
                    df.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
                    .withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
                )
        elif name in ("orders", "lineitem", "customer"):
            # shift order/customer keys consistently across the three
            # tables so join integrity survives the replication; part /
            # supplier / nation stay dims (their keys are unshifted)
            n_ord = load(spark, SRC, "orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
            n_cust = load(spark, SRC, "customer").agg(F.max("c_custkey")).collect()[0][0] + 1
            shifts = {
                "orders": [("o_orderkey", n_ord), ("o_custkey", n_cust)],
                "lineitem": [("l_orderkey", n_ord)],
                "customer": [("c_custkey", n_cust)],
            }[name]
            scaled = df
            for i in range(1, COPIES):
                rep = df
                for col, base in shifts:
                    rep = rep.withColumn(col, F.col(col) + F.lit(i * base))
                scaled = scaled.unionByName(rep)
        else:
            scaled = df  # true dims (region/nation/part/supplier) stay fixed
        path = os.path.join(out_dir, f"{name}.parquet")
        scaled.write.mode("overwrite").parquet(path)
        sizes[name] = spark.read.parquet(path).count()
    print(json.dumps({"probe_input_rows": sizes}), flush=True)


def main() -> None:
    from flink_cookbook_spark.pipeline._cache import clear
    from flink_cookbook_spark.registry import get_query
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-sf1-probe")
    # SPARK_GRAFT_PROBE_DATA_DIR: reuse (and keep) an already-scaled
    # dataset — same contract as probe_correctness.py, so a sweep's
    # data directory can be re-probed for timings without regeneration.
    data_dir = os.environ.get("SPARK_GRAFT_PROBE_DATA_DIR")
    keep_data = data_dir is not None
    out_dir = data_dir or tempfile.mkdtemp(prefix="fcs_sf1_")
    try:
        if not (keep_data and os.path.exists(os.path.join(out_dir, "_SCALED_OK"))):
            _scale(spark, out_dir)
            if keep_data:
                open(os.path.join(out_dir, "_SCALED_OK"), "w").close()
        clear()
        results = {}
        for name in QUERIES:
            fn = get_query(name).fn
            t0 = time.perf_counter()
            df = fn(spark, out_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 2)
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[name] = {
                "sec": dt,
                "rows": n,
                "shuffle_exchanges": plan.count("Exchange hashpartitioning"),
                "broadcast_exchanges": plan.count("BroadcastExchange"),
            }
            print(json.dumps({name: results[name]}), flush=True)
        print(json.dumps({"metric": "sf1_probe", "copies": COPIES, "queries": results}))
    finally:
        clear()
        if not keep_data:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
