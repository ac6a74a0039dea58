"""Warm per-query timing helper for round-14 A/Bs.

Usage: python plans/time_r14.py <reps> <query> [query ...]
Runs each query <reps> times (bench-style .count() action) after one
untimed warm-up pass over ALL listed queries (memo builds + JIT), and
prints per-query min/median/all. Not a bench replacement — a same-host
A/B instrument (guide section 1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    from flink_cookbook_spark.registry import get_query
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-time-r14")
    spark.range(1).count()
    for name in names:  # warm-up: memos, codegen
        get_query(name).fn(spark, SF_DIR).count()
    out = {}
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            get_query(name).fn(spark, SF_DIR).count()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(ts), "median": statistics.median(ts), "all": ts}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
