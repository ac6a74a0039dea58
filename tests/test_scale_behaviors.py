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


# --- hot-key skew stress: the two operators most exposed at 100x -------
#
# An 80/20 key distribution (one user holds 80% of all rows) is the shape
# web/telemetry data takes at real scale. Window-sweep operators (as-of
# join, gap-fill carry) cannot salt their key — the whole key must land in
# one partition — so the scale posture to pin is: (a) results stay correct
# under skew, (b) the plan shape is IDENTICAL to the uniform case (no
# extra exchange, no fallback), and (c) per-key output/state is bounded by
# time span, never by the hot key's row count.

_SKEW_BASE = 1_699_999_200  # divisible by 3600 and 900: closed-form ticks


def _write_skewed_events(spark, path, hot_rows=160_000, cold_keys=400, cold_rows_per_key=100):
    """hot user_id=1: 80% of rows packed into a 1-day span (1 s cadence);
    400 cold users: 100 rows each spread over ~30 days."""
    hot = spark.range(hot_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(_SKEW_BASE) + F.col("id") % 86_400).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    cold = spark.range(cold_keys * cold_rows_per_key).select(
        (F.lit(1_000_000) + F.col("id")).alias("event_id"),
        F.timestamp_seconds(
            F.lit(_SKEW_BASE) + (F.col("id") / cold_keys).cast("long") * 25_920
        ).alias("ts"),
        (F.lit(2) + F.col("id") % cold_keys).cast("long").alias("user_id"),
        (F.col("id") % 89).cast("double").alias("value"),
    )
    hot.unionByName(cold).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_asof_join_under_hot_key_skew(spark, tmp_path):
    """As-of join with one key holding 80% of rows: results must match the
    closed form (latest hourly tick <= ts) with zero driver-side
    materialization, and the plan must keep the uniform case's exchange
    count — skew must not introduce a new shuffle or a fallback join."""
    from flink_cookbook_spark.operators.metrics import asof_join
    from flink_cookbook_spark.plans.explain import count_exchanges, has_cartesian

    _write_skewed_events(spark, str(tmp_path))
    left = load(spark, str(tmp_path), "events").select("user_id", "ts", "value")
    # right side: hourly ticks per user over the full span, value = tick sec
    span = 2_600_000
    ticks = (
        left.select("user_id").distinct().select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(_SKEW_BASE), F.lit(_SKEW_BASE + span), F.lit(3600)
                )
            ).alias("tick_sec"),
        )
        .select(
            "user_id",
            F.timestamp_seconds("tick_sec").alias("bts"),
            F.col("tick_sec").cast("double").alias("bvalue"),
        )
    )
    joined = asof_join(
        left, ticks, key="user_id", left_ts="ts", right_ts="bts",
        value_cols=["bvalue"], how="inner",
    )
    expected = (F.floor(F.col("ts").cast("long") / 3600) * 3600).cast("double")
    bad = joined.where(F.col("bvalue_asof") != expected).count()
    assert bad == 0
    assert joined.count() == 200_000  # every row has a prior tick
    assert not has_cartesian(joined)
    # same plan shape as the uniform-key pin (test_plans.py): <= 5 exchanges
    assert count_exchanges(joined) <= 5


def test_gap_fill_output_bounded_by_span_not_rows(spark, tmp_path):
    """Gap-fill's per-key grid must grow with the key's TIME SPAN, never
    its row count: the hot key's 160k rows collapse to 96 buckets (1-day
    span / 15 min), while a 100-row cold key legitimately yields ~2852
    buckets (30-day span) — the bounded-``sequence()`` contract that keeps
    a hot key from exploding a partition at 100x."""
    from flink_cookbook_spark.operators.timeseries import gap_fill_locf

    _write_skewed_events(spark, str(tmp_path))
    out = gap_fill_locf(spark, str(tmp_path))
    sizes = {r.user_id: (r.n, r.gaps) for r in
             out.groupBy("user_id").agg(
                 F.count("*").alias("n"),
                 F.sum(F.col("is_gap").cast("long")).alias("gaps"),
             ).collect()}
    # hot key: span 86399 s -> buckets base..base+85500 step 900 = 96 rows,
    # every bucket observed (1 s cadence) -> 0 gaps, despite 160k input rows
    assert sizes[1] == (96, 0), sizes[1]
    # cold keys: span 99*25920 s -> 2852 grid rows, ~100 observed
    n_cold, gaps_cold = sizes[2]
    assert n_cold == 99 * 25_920 // 900 + 1, n_cold
    assert gaps_cold == n_cold - 100  # 100 observations, all distinct buckets
    # LOCF: after the first bucket no cold key may have a NULL fill
    nulls = out.where(F.col("value_filled").isNull()).count()
    assert nulls == 0


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


def test_two_stage_skew_agg_matches_direct_under_skew(spark, tmp_path):
    """two_stage_skew_agg on an 80/20 hot-key fixture must equal the
    direct single-stage aggregation exactly (count/avg/min/max), and the
    salt stage must actually spread the hot key (every salt bucket
    populated for it) — the property that keeps any one reducer from
    seeing a whole hot key at scale."""
    from flink_cookbook_spark.operators.skew import two_stage_skew_agg

    _write_skewed_events(spark, str(tmp_path / "raw"))
    # the shared skew fixture has no event_type: derive one with the hot
    # user as its own (hot) type and cold users spread over 5 types
    typed = load(spark, str(tmp_path / "raw"), "events").withColumn(
        "event_type",
        F.when(F.col("user_id") == 1, F.lit("hot")).otherwise(
            F.concat(F.lit("cold_"), (F.col("user_id") % 5).cast("string"))
        ),
    )
    typed.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r for r in two_stage_skew_agg(spark, str(tmp_path)).collect()
    }
    ev = load(spark, str(tmp_path), "events")
    want = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.avg("value").alias("avg_value"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for et, g in got.items():
        w = want[et]
        assert g.n_events == w.n_events, et
        assert abs(g.avg_value - round(w.avg_value + 1e-6, 4)) < 1e-9, et
        assert g.min_value == round(w.mn + 1e-6, 4), et
        assert g.max_value == round(w.mx + 1e-6, 4), et
        # the hot key's rows spread across all 8 salt partials
        if g.n_events > 10_000:
            assert g.n_salt_partials == 8, et
