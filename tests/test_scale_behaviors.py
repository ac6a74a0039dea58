"""Scale-behavior tests: late-data watermark semantics, skew-salted
joins, approximate-sketch accuracy."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load


def test_watermark_drops_late_data(spark, tmp_path):
    """A row older than (max event time - watermark) arriving in a LATER
    micro-batch must be dropped from the aggregate; the reference has no
    late-data story at all (SURVEY.md section 1.4) — this pins ours."""
    src = str(tmp_path / "late_src")
    out_rows = []

    def collect_batch(df, epoch):
        out_rows.extend(df.collect())

    # batch 1: on-time data advancing the watermark to 12:00 - 10min
    spark.createDataFrame(
        [("n1", "2024-01-01 11:00:00", 10.0), ("n1", "2024-01-01 12:00:00", 20.0)],
        "node_id string, ts_s string, cpu double",
    ).select("node_id", F.to_timestamp("ts_s").alias("ts"), "cpu").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("node_id string, ts timestamp, cpu double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "node_id")
        .agg(F.sum("cpu").alias("total"))
        .select(F.col("w.start").cast("long").alias("ws"), "node_id", "total")
    )
    q = stream.writeStream.outputMode("append").foreachBatch(collect_batch).start()
    q.processAllAvailable()
    # batch 2: one very late row (11:00 window, watermark already at 11:50)
    spark.createDataFrame(
        [("n1", "2024-01-01 11:00:01", 999.0), ("n1", "2024-01-01 12:30:00", 30.0)],
        "node_id string, ts_s string, cpu double",
    ).select("node_id", F.to_timestamp("ts_s").alias("ts"), "cpu").coalesce(
        1
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    totals = {r.ws: r.total for r in out_rows}
    win_11 = int(time.mktime(time.strptime("2024-01-01 11:00:00", "%Y-%m-%d %H:%M:%S")))
    # the late 999.0 must NOT appear in any emitted window
    assert all(t < 999.0 for t in totals.values()), totals
    # the on-time 11:00 window closed with only the original 10.0
    assert any(abs(t - 10.0) < 1e-9 for t in totals.values()), totals


def test_salted_join_matches_plain_join(spark, sf_dir):
    from flink_cookbook_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(li, orders, "l_orderkey", n_salts=4)
    want = li.join(orders, "l_orderkey")
    assert got.count() == want.count()
    g = got.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s")).collect()
    w = want.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s")).collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, w))


def test_approx_percentile_accuracy(spark, sf_dir):
    """percentile_approx must land within 2% relative error of the exact
    interpolated percentile at sf fixture sizes."""
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02


def test_cusum_drift_constant_user_null_parity(spark, tmp_path):
    """A user with identical values has sd=0; Spark's guarded divide and
    the oracle's nullif(sd,0) must BOTH yield NULL for drift_ratio (DuckDB
    ieee division would otherwise return inf and flip the hash)."""
    import duckdb
    import pandas as pd

    from flink_cookbook_spark.operators.timeseries import cusum_drift
    from flink_cookbook_spark.registry import get_query
    from tests.oracle_harness import compare

    rows = []
    for i in range(6):
        rows.append({"event_id": i, "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                     "user_id": 1, "event_type": "view", "value": 42.0, "props": "{}"})
        rows.append({"event_id": 100 + i, "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                     "user_id": 2, "event_type": "view", "value": float(i * i), "props": "{}"})
    path = str(tmp_path / "events.parquet")
    pd.DataFrame(rows).to_parquet(path)

    out = cusum_drift(spark, str(tmp_path))
    got = {r.user_id: r.drift_ratio for r in out.collect()}
    assert got[1] is None, got
    assert got[2] is not None

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    problems = compare(out, con, get_query("cusum_drift").oracle, "cusum_drift")
    assert not problems, problems
