"""ENGINE-side-only 1000x probe (round-13, verdict item 3).

Six queries' DuckDB oracle replays died of single-node OOM/disk at
1000x in every round-12 attempt (user_event_paths, wasserstein_drift,
markov_stationary_distribution, copurchase_degree_distribution,
graph_assortativity, column_similarity_matching) — the comparison
harness, not the engine, is the bottleneck. Following the round-11
graph-family precedent, this runs ONLY the Spark side against the
standing scaled directory and records wall time, output rows, and
(AQE-decided) exchange counts per query, with per-query exception
containment so one death doesn't void the batch. Results stream to
``SPARK_GRAFT_PROBE_RESULTS`` as JSONL.

    SPARK_GRAFT_PROBE_DATA_DIR=/tmp/fcs_scale1000 \
    SPARK_GRAFT_PROBE_QUERIES=a,b,c \
    SPARK_GRAFT_PROBE_RESULTS=probe1000_engine_r13.jsonl \
    python probe_engine1000.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    from flink_cookbook_spark.pipeline._cache import clear
    from flink_cookbook_spark.registry import get_query
    from flink_cookbook_spark.session import get_spark

    data_dir = os.environ["SPARK_GRAFT_PROBE_DATA_DIR"]
    names = [
        q.strip()
        for q in os.environ["SPARK_GRAFT_PROBE_QUERIES"].split(",")
        if q.strip()
    ]
    results_path = os.environ.get("SPARK_GRAFT_PROBE_RESULTS")
    done = set()
    if results_path and os.path.exists(results_path):
        with open(results_path) as fh:
            for line in fh:
                try:
                    done.update(json.loads(line))
                except ValueError:
                    pass

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        if results_path:
            with open(results_path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")

    spark = get_spark(app_name="fcs-engine1000-probe")
    for name in names:
        if name in done:
            continue
        clear()
        t0 = time.perf_counter()
        try:
            df = get_query(name).fn(spark, data_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 2)
            plan = df._jdf.queryExecution().executedPlan().toString()
            emit(
                {
                    name: {
                        "status": "OK",
                        "sec": dt,
                        "rows": n,
                        "shuffle_exchanges": plan.count(
                            "Exchange hashpartitioning"
                        ),
                        "broadcast_exchanges": plan.count("BroadcastExchange"),
                    }
                }
            )
        except Exception as exc:  # noqa: BLE001 — containment by design
            dt = round(time.perf_counter() - t0, 2)
            emit(
                {
                    name: {
                        "status": "ERROR",
                        "sec": dt,
                        "error": f"{type(exc).__name__}: {exc}"[:300],
                    }
                }
            )
    clear()


if __name__ == "__main__":
    main()
