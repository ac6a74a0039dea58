"""Streaming drift monitor: windowed distribution comparison against a
frozen reference — the live form of ``ks_test_drift``.

Each event-time tumbling window accumulates a binned value histogram
per event type (watermarked streaming aggregation — bounded state: the
unit-bin vocabulary per key per open window); on every micro-batch the
completed windows' histograms are compared against a REFERENCE
distribution (broadcast — it is a bounded bin table frozen from a
calibration period) and a KS-style sup-gap plus a drift verdict are
appended to the sink. This is the production ML-monitoring loop:
``ks_test_drift`` decides offline whether two halves differ;
this operator raises the same statistic continuously as data arrives.

Streaming==batch parity (every emitted window's D equals the batch
computation over the same window) is pinned in
tests/test_streaming.py::test_streaming_drift_monitor_equals_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load

#: tumbling window length for the monitored histograms.
DRIFT_WINDOW = "1 day"

#: watermark delay for late data.
DRIFT_DELAY = "1 hour"

#: KS-gap threshold above which a window is flagged as drifted (the
#: monitor's alert knob; the offline test computes the exact critical
#: value — a live monitor runs on a fixed budget-derived threshold).
DRIFT_D_THRESHOLD = 0.2

#: reference period: everything before this epoch second freezes into
#: the reference distribution (week 1 of the fixture month).
DRIFT_REF_END_S = 1704067200 + 7 * 86400


def reference_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen calibration histogram: per (event_type, unit bin),
    the reference-period count and within-type share."""
    ev = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    ref = (
        ev.where(sec < DRIFT_REF_END_S)
        .groupBy("event_type", F.floor("value").cast("long").alias("bin"))
        .agg(F.count("*").alias("ref_n"))
    )
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    return ref.select(
        "event_type",
        "bin",
        "ref_n",
        (F.col("ref_n") / F.sum("ref_n").over(wt)).alias("ref_share"),
    )


def windowed_histogram(stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window histogram of the metric per type —
    the streaming aggregation whose state is bounded by (open windows
    x event types x unit bins)."""
    return (
        stream.withWatermark("ts", DRIFT_DELAY)
        .groupBy(
            F.window("ts", DRIFT_WINDOW).alias("w"),
            "event_type",
            F.floor("value").cast("long").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("w_start"),
            "event_type",
            "bin",
            "n",
        )
    )


def drift_gap(hist: DataFrame, ref: DataFrame) -> DataFrame:
    """KS-style sup-gap between each (window, type) histogram and the
    reference: per (window, type) group PRESENT in ``hist``, align the
    window histogram against the COMPLETE reference bin axis for that
    type (zero-filled on both sides), cumulate both CDFs over the union
    axis, take the max |gap|. Pure batch DataFrame logic — reused
    identically by the foreachBatch monitor and the batch parity twin.

    The axis is built as (distinct (w_start, event_type) in the batch)
    x (that type's full reference bin table), full-outer-joined with
    the window histogram — NOT by fanning globally-unmatched reference
    bins across windows. The latter makes a window's reference CDF
    depend on which OTHER windows share its micro-batch (a bin matched
    by any window is never fanned to windows lacking it), violating the
    streaming==batch contract, and emits n_events=0 / ks_d~1 rows for
    (window, type) groups with no data at all. A (window, type) group
    only exists here if the window actually observed that type."""
    from pyspark.sql import Window as W

    pairs = hist.select("w_start", "event_type").distinct()
    ref_axis = pairs.join(
        F.broadcast(ref.select("event_type", "bin", "ref_n")),
        "event_type",
        "inner",
    )
    aligned = ref_axis.join(
        hist, ["w_start", "event_type", "bin"], "full_outer"
    ).select(
        "w_start",
        "event_type",
        "bin",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
    )
    wc = (
        W.partitionBy("w_start", "event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wt = W.partitionBy("w_start", "event_type")
    cdf = aligned.select(
        "w_start",
        "event_type",
        (F.sum("n").over(wc) / F.greatest(F.sum("n").over(wt), F.lit(1))).alias(
            "cdf_w"
        ),
        (
            F.sum("ref_n").over(wc)
            / F.greatest(F.sum("ref_n").over(wt), F.lit(1))
        ).alias("cdf_r"),
        F.sum("n").over(wt).alias("n_w"),
    )
    return (
        cdf.groupBy("w_start", "event_type")
        .agg(
            F.max("n_w").alias("n_events"),
            F.round(
                F.max(F.abs(F.col("cdf_w") - F.col("cdf_r"))) + 1e-6, 6
            ).alias("ks_d"),
        )
        .select(
            "w_start",
            "event_type",
            "n_events",
            "ks_d",
            (F.col("ks_d") > DRIFT_D_THRESHOLD).alias("drifted"),
        )
    )


def drift_monitor(
    stream: DataFrame,
    ref: DataFrame,
    out_dir: str,
    checkpoint: str,
):
    """The live monitor: watermarked windowed histograms, compared to
    the broadcast reference in foreachBatch, drift rows appended to a
    parquet sink (restart-safe via the checkpoint)."""
    hist = windowed_histogram(stream)
    ref_b = F.broadcast(ref)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            drift_gap(batch_df, ref_b)
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        hist.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
