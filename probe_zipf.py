"""Zipfian-key skew probe: hold the keyed operators to a power-law key
distribution instead of the fixtures' near-uniform one.

The committed skew evidence (tests/test_scale_behaviors.py) uses a
synthetic 80/20 single-hot-key split; real corpora skew as a power law
with a long graded head. This probe remaps ``events.user_id`` to a
Zipf(s) rank via inverse-CDF on the seeded md5 uniform of event_id
(deterministic, engine-free), replicates to probe scale, and then:

1. runs ``hot_key_profile`` on both the uniform and Zipf variants —
   the diagnostic must actually REPORT the skew it exists to catch;
2. checks ``two_stage_skew_agg`` still equals the direct single-stage
   groupBy on the Zipf variant (algebraic identity under real skew);
3. times the keyed-window family (five_min_window_agg, sessionize,
   latest_baseline_join) on uniform vs Zipf at the same row count —
   window semantics pin a key's rows to one task, so the Zipf wall
   time bounds what a power-law head costs; the assertion is
   completion + identical exchange counts (plan shape is distribution-
   independent), the timing ratio is recorded for PERF.md.

Off-CI by design: run manually, record in PERF.md.

    python probe_zipf.py                       # 10x rows, s=1.3
    SPARK_GRAFT_PROBE_COPIES=30 SPARK_GRAFT_ZIPF_S=1.5 python probe_zipf.py
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
ZIPF_S = float(os.environ.get("SPARK_GRAFT_ZIPF_S", "1.3"))
TIMED = ("five_min_window_agg", "sessionize", "latest_baseline_join")


def main() -> None:
    from pyspark.sql import functions as F

    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline._cache import clear
    from flink_cookbook_spark.registry import get_query
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-zipf-probe")
    base = tempfile.mkdtemp(prefix="fcs_zipf_")
    uni_dir, zipf_dir = os.path.join(base, "uniform"), os.path.join(base, "zipf")
    report: dict[str, object] = {"copies": COPIES, "s": ZIPF_S}
    try:
        ev = load(spark, SRC, "events")
        n0 = ev.count()
        n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
        scaled = ev
        for i in range(1, COPIES):
            scaled = scaled.unionByName(
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * n0))
            )
        # deterministic uniform in (0,1] from the event id (md5 PRF --
        # the same seeding idiom as the synthetic datagen source), then
        # the Zipf-like inverse CDF u -> ceil(u^(-1/(s-1))) - 1 capped
        # to the key domain: rank-0 mass ~ (1 - 2^-(s-1)), a graded
        # power-law head instead of one synthetic hot key.
        u = (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 13), 16, 10)
            .cast("double")
            / F.lit(float(16**13))
        )
        zipf_rank = F.least(
            F.lit(n_users * COPIES - 1),
            (F.ceil(F.pow(u + F.lit(1e-18), F.lit(-1.0 / (ZIPF_S - 1.0)))) - 1).cast("long"),
        )
        for out_dir, user_expr in (
            (uni_dir, F.col("user_id") + (F.col("event_id") % F.lit(COPIES)) * n_users),
            (zipf_dir, zipf_rank),
        ):
            df = scaled.withColumn("user_id", user_expr.cast(ev.schema["user_id"].dataType))
            df.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
            # the keyed queries only read events; baselines derive from it
        report["rows"] = spark.read.parquet(os.path.join(zipf_dir, "events.parquet")).count()

        # 1. the skew diagnostic must see the skew
        for label, d in (("uniform", uni_dir), ("zipf", zipf_dir)):
            clear()
            prof = {
                r["key_col"]: (r["max_rows"], r["skew_factor"])
                for r in get_query("hot_key_profile").fn(spark, d).collect()
            }
            report[f"hot_key_profile_{label}"] = {
                "user_max_rows": prof["user_id"][0],
                "user_skew_factor": prof["user_id"][1],
            }
            print(json.dumps({f"hot_key_profile_{label}": report[f"hot_key_profile_{label}"]}), flush=True)
        assert (
            report["hot_key_profile_zipf"]["user_skew_factor"]
            > 10 * report["hot_key_profile_uniform"]["user_skew_factor"]
        ), "zipf remap produced no measurable skew"

        # 2. two-stage salted agg == direct groupBy under real skew
        clear()
        ev_z = spark.read.parquet(os.path.join(zipf_dir, "events.parquet"))
        direct = {
            r["event_type"]: (r["n"], round(r["s"], 4))
            for r in ev_z.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        staged = {
            r["event_type"]: (r["n_events"], round(r["n_events"] * r["avg_value"], 2))
            for r in get_query("two_stage_skew_agg").fn(spark, zipf_dir).collect()
        }
        assert set(direct) == set(staged)
        for k in direct:
            assert direct[k][0] == staged[k][0], (k, direct[k], staged[k])
        report["two_stage_matches_direct"] = True

        # 3. keyed-window family: uniform vs zipf wall time, same plans
        timings: dict[str, dict[str, float]] = {}
        for name in TIMED:
            fn = get_query(name).fn
            row: dict[str, float] = {}
            for label, d in (("uniform", uni_dir), ("zipf", zipf_dir)):
                clear()
                fn(spark, d).count()  # warm the plan/codegen
                t0 = time.perf_counter()
                df = fn(spark, d)
                df.count()
                row[label] = round(time.perf_counter() - t0, 2)
                plan = df._jdf.queryExecution().executedPlan().toString()
                row[f"{label}_exchanges"] = plan.count("Exchange hashpartitioning")
            row["ratio"] = round(row["zipf"] / row["uniform"], 2) if row["uniform"] else None
            timings[name] = row
            print(json.dumps({name: row}), flush=True)
            assert row["uniform_exchanges"] == row["zipf_exchanges"], name
        report["timings"] = timings
        print(json.dumps({"metric": "zipf_probe", **report}))
    finally:
        clear()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
