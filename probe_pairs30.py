"""Pair-family 30x probe: prove the LSH scale path AT the scale where
the exact paths are excluded (round-10 verdict ask; PERF.md).

The whole-registry 30x sweep deliberately excludes the exact pair
family: replicating the corpus 30x gives every document 29 exact twins,
so the TRUE-pair workload is ~2.2M pairs by fixture construction and
the exact inverted-index verify (cost proportional to true overlaps)
is legitimately quadratic-in-duplication there. But the CLAIMED answer
at that scale — MinHash+LSH candidate generation + exact verify on
candidates only — had not itself been timed or recall-checked at 30x.
This probe does both:

1. FULL 30x corpus (150k docs, every base doc x30): wall time, output
   rows, and final-plan exchange counts for ``minhash_lsh_pairs`` and
   the downstream ``dedup_clusters`` closure.
2. RECALL on a sampled stratum: 2% of base documents (every copy of
   each sampled base, so twin pairs stay intact), small enough that the
   exact inverted-index Jaccard is tractable as ground truth. Recall =
   |LSH-verified pairs| / |exact pairs >= threshold| on the stratum;
   LSH verify uses the same exact Jaccard on candidates, so LSH pairs
   are a subset of exact pairs and precision is 1.0 by construction
   (the probe asserts it).

Off-CI by design (minutes): run manually, record in PERF.md.

    python probe_pairs30.py
    SPARK_GRAFT_PROBE_COPIES=30 SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1 \
        python probe_pairs30.py
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
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "30"))
#: 1-in-N base-document sampling for the recall stratum.
STRATUM_MOD = int(os.environ.get("SPARK_GRAFT_PROBE_STRATUM_MOD", "50"))


def _plan_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_exchanges": plan.count("Exchange hashpartitioning"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
    }


def _timed_count(fn, spark, sf_dir):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    dt = round(time.perf_counter() - t0, 2)
    return df, n, dt


def main() -> None:
    from pyspark.sql import functions as F

    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline._cache import clear
    from flink_cookbook_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-pairs30-probe")
    base = tempfile.mkdtemp(prefix="fcs_pairs30_")
    full_dir = os.path.join(base, "full")
    strat_dir = os.path.join(base, "stratum")
    report: dict[str, object] = {"copies": COPIES, "stratum_mod": STRATUM_MOD}
    try:
        docs = load(spark, SRC, "documents")
        n0 = docs.count()
        scaled = docs
        for i in range(1, COPIES):
            scaled = scaled.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n0))
            )
        scaled.write.mode("overwrite").parquet(os.path.join(full_dir, "documents.parquet"))
        full = spark.read.parquet(os.path.join(full_dir, "documents.parquet"))
        report["full_docs"] = full.count()

        # stratum: every copy of 1-in-STRATUM_MOD base documents
        full.where((F.col("doc_id") % n0) % STRATUM_MOD == 0).write.mode(
            "overwrite"
        ).parquet(os.path.join(strat_dir, "documents.parquet"))
        report["stratum_docs"] = spark.read.parquet(
            os.path.join(strat_dir, "documents.parquet")
        ).count()

        clear()
        # --- 1. full-corpus timing -------------------------------------
        lsh_df, n_pairs, lsh_sec = _timed_count(minhash_lsh_pairs, spark, full_dir)
        report["minhash_lsh_pairs"] = {
            "sec": lsh_sec, "pairs": n_pairs, **_plan_counts(lsh_df),
        }
        print(json.dumps({"minhash_lsh_pairs": report["minhash_lsh_pairs"]}), flush=True)
        cl_df, n_rows, cl_sec = _timed_count(dedup_clusters, spark, full_dir)
        report["dedup_clusters"] = {
            "sec": cl_sec, "rows": n_rows, **_plan_counts(cl_df),
        }
        print(json.dumps({"dedup_clusters": report["dedup_clusters"]}), flush=True)

        # --- 2. recall on the stratum ----------------------------------
        clear()
        exact_df, n_exact, exact_sec = _timed_count(ngram_jaccard_pairs, spark, strat_dir)
        lsh_s_df, n_lsh, lsh_s_sec = _timed_count(minhash_lsh_pairs, spark, strat_dir)
        exact_pairs = exact_df.select("doc1", "doc2")
        lsh_pairs = lsh_s_df.select("doc1", "doc2")
        n_hit = lsh_pairs.join(exact_pairs, ["doc1", "doc2"], "inner").count()
        n_extra = lsh_pairs.join(exact_pairs, ["doc1", "doc2"], "left_anti").count()
        report["stratum_recall"] = {
            "exact_pairs": n_exact,
            "exact_sec": exact_sec,
            "lsh_pairs": n_lsh,
            "lsh_sec": lsh_s_sec,
            "recall": round(n_hit / n_exact, 4) if n_exact else None,
            "lsh_not_in_exact": n_extra,  # must be 0: verify IS exact Jaccard
        }
        print(json.dumps({"stratum_recall": report["stratum_recall"]}), flush=True)
        assert n_extra == 0, "LSH emitted a pair the exact index did not"
        print(json.dumps({"metric": "pairs30_probe", **report}))
    finally:
        clear()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
