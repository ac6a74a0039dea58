"""Dump .explain('formatted') for the round-14 touched queries.

Usage: python plans/dump_r14.py before|after [query ...]
Writes plans/r14/<query>_<tag>.txt. Plans are captured with warm memos
(each query's plan is built after its memo dependencies are registered,
matching the bench's steady state).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = (
    "latest_baseline_join",
    "next_baseline_join",
    "pipeline_alerts_fallback_oracle",
    "pipeline_alerts_end_to_end",
    "q11_important_part_values",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "sarimax_baseline",
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(DEFAULT)
    from flink_cookbook_spark.plans.explain import formatted_plan
    from flink_cookbook_spark.registry import get_query
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-plan-dump-r14")
    out_dir = os.path.join(REPO_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        # warm the query's memo dependencies first: a cold cached relation
        # reports unknown partitioning (canChangeCachedPlanOutputPartitioning
        # resolves it at runtime), so cold dumps show ENSURE_REQUIREMENTS
        # exchanges the executed plan elides. One throwaway action puts the
        # plan in the bench's steady state.
        get_query(name).fn(spark, SF_DIR).count()
        df = get_query(name).fn(spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
