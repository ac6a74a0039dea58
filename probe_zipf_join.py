"""Zipf-skewed JOIN probe: measure the layered skew defenses on a
power-law join key, where probe_zipf.py covered the keyed window/agg
family.

At 100 TB the "small" side of a fact-dim join can exceed the broadcast
threshold, forcing a shuffle join on the key — exactly where a Zipfian
hot key pins wall-clock to one straggler task. This probe builds that
regime deliberately: lineitem replicated to probe scale with
``l_partkey`` remapped to Zipf(s) ranks (the head part holds
~(1-2^-(s-1)) of ALL lineitems), ``autoBroadcastJoinThreshold=-1`` so
the part dim cannot be broadcast, then one join+agg (revenue per
brand) three ways:

1. ``naive``  — plain shuffle join, AQE skew-join splitting DISABLED:
   the undefended baseline a straggler analysis predicts.
2. ``aqe``    — plain shuffle join, AQE skew-join ON (the session
   default): Spark's runtime split of oversized partitions.
3. ``salted`` — explicit ``salted_join`` 8-way fan-out (operators/
   skew.py), the declared mitigation when skew feeds an aggregation
   or exceeds AQE's split granularity.

All three must agree on every output row (exact brand totals); the
recorded artifact is the wall-time ratio naive/aqe/salted plus the
hot-key mass, so PERF.md can state what each defense layer buys under
a graded power law rather than the committed 80/20 synthetic split.

Off-CI by design: run manually on an otherwise idle box, record in
PERF.md.

    python probe_zipf_join.py                    # 30x, s=1.5
    SPARK_GRAFT_PROBE_COPIES=10 SPARK_GRAFT_ZIPF_S=1.3 python probe_zipf_join.py
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
ZIPF_S = float(os.environ.get("SPARK_GRAFT_ZIPF_S", "1.5"))


def main() -> None:
    from pyspark.sql import functions as F

    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.operators.skew import salted_join
    from flink_cookbook_spark.session import get_spark

    spark = get_spark(app_name="fcs-zipf-join-probe")
    base = tempfile.mkdtemp(prefix="fcs_zipfjoin_")
    report: dict[str, object] = {"copies": COPIES, "s": ZIPF_S}
    conf_restore = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    try:
        li = load(spark, SRC, "lineitem")
        part = load(spark, SRC, "part").select("p_partkey", "p_brand")
        n0 = li.count()
        n_parts = part.count()
        scaled = li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        for i in range(1, COPIES):
            scaled = scaled.unionByName(
                li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
                .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
            )
        # Zipf-like inverse CDF on a seeded md5 uniform of the row id
        # (same idiom as probe_zipf.py): rank 0 = the hot part.
        rid = F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
        u = (
            F.conv(F.substring(F.md5(rid), 1, 13), 16, 10).cast("double")
            / F.lit(float(16**13))
        )
        zipf_rank = F.least(
            F.lit(n_parts - 1),
            (F.ceil(F.pow(u + F.lit(1e-18), F.lit(-1.0 / (ZIPF_S - 1.0)))) - 1).cast("long"),
        )
        # part keys are 1-based in the fixtures
        skewed = scaled.withColumn("l_partkey", (zipf_rank + 1).cast("long"))
        li_path = os.path.join(base, "lineitem_zipf.parquet")
        skewed.write.mode("overwrite").parquet(li_path)
        li_z = spark.read.parquet(li_path)
        n_rows = li_z.count()
        hot = (
            li_z.groupBy("l_partkey").count().orderBy(F.col("count").desc()).first()
        )
        report["rows"] = n_rows
        report["hot_part_rows"] = hot["count"]
        report["hot_part_share"] = round(hot["count"] / n_rows, 3)
        print(json.dumps({k: report[k] for k in ("rows", "hot_part_rows", "hot_part_share")}), flush=True)

        # the dim "cannot" be broadcast (the 100 TB regime under probe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def agg_of(joined):
            return joined.groupBy("p_brand").agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,2)")
                ).alias("revenue"),
            )

        def run(label: str, skew_join: bool, use_salt: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower()
            )
            joined = (
                salted_join(li_z, part, "p_partkey", n_salts=8)
                if use_salt
                else li_z.join(
                    part, li_z.l_partkey == part.p_partkey, "inner"
                )
            )
            df = agg_of(joined)
            df.count()  # warm codegen/scan cache effects symmetrically
            t0 = time.perf_counter()
            rows = {r["p_brand"]: (r["n"], str(r["revenue"])) for r in df.collect()}
            dt = round(time.perf_counter() - t0, 2)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec = {
                "sec": dt,
                "skew_split_in_plan": "skew=true" in plan,
                "exchanges": plan.count("Exchange hashpartitioning"),
            }
            print(json.dumps({label: rec}), flush=True)
            return rows, rec

        # salted_join joins on the SMALL side's key name: give the big
        # side that column name too (salted_join joins on [key, salt])
        li_z = li_z.withColumnRenamed("l_partkey", "p_partkey")
        salted_rows, salted_rec = run("salted", skew_join=True, use_salt=True)
        li_z = li_z.withColumnRenamed("p_partkey", "l_partkey")
        naive_rows, naive_rec = run("naive", skew_join=False, use_salt=False)
        aqe_rows, aqe_rec = run("aqe", skew_join=True, use_salt=False)

        assert naive_rows == aqe_rows == salted_rows, "variant results differ"
        report["naive"] = naive_rec
        report["aqe"] = aqe_rec
        report["salted"] = salted_rec
        report["results_identical"] = True
        report["naive_over_aqe"] = round(naive_rec["sec"] / aqe_rec["sec"], 2)
        report["naive_over_salted"] = round(naive_rec["sec"] / salted_rec["sec"], 2)
        print(json.dumps({"metric": "zipf_join_probe", **report}))
    finally:
        for k, v in conf_restore.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
