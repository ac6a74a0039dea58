"""Driver-checkable batch twins of streaming-ONLY semantics.

The watermark late-data drop and dropDuplicatesWithinWatermark behaviors
are exercised live in tests/test_streaming.py and
tests/test_scale_behaviors.py, but a streaming query cannot be
oracle-compared by the driver. These twins restate the SEMANTIC RULE of
each behavior as a deterministic batch query over ``events`` that DuckDB
can verify, so the driver records real correctness evidence for the
streaming feature set (VERDICT round 1, next-round item 4).

Determinism notes:
- The fixture's events are time-ordered, so "arrival order" must be
  synthesized to produce genuine out-of-orderness: each event's arrival
  time is its event time plus a deterministic pseudo-random jitter of
  +/- 450 s derived from md5(event_id) — identical in both engines.
  The stream is then mostly in-order, with a realistic late tail: an
  event is late when a record more than LATE_DELAY_SECONDS newer
  arrived first, which the jitter bound makes possible (900 s max
  displacement > 600 s delay) but not pervasive.
- The late-drop rule implemented is the bounded-out-of-orderness
  watermark both Flink (BoundedOutOfOrdernessWatermarks) and Spark
  (max event time - delay, advanced per trigger) apply: a record is
  late iff its event time is older than (max event time seen strictly
  before it, in arrival order) minus the delay. Spark advances the
  watermark per micro-batch rather than per record, so the per-record
  rule is the conservative (strictest) member of the same family — the
  live behavior is pinned separately in tests/test_scale_behaviors.py.

Scale note (100 TB): the watermark is tracked PER INGEST PARTITION —
events carry a synthesized partition id (md5(user_id) % N_INGEST_PARTITIONS,
the keyed-producer placement a Kafka topic gives), and the running-max
window partitions on it. That is both the faithful model (Flink/Spark
track watermarks per source split and Kafka guarantees order only within
a partition) and the scale-safe plan: N parallel bounded sorts instead
of one global single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import ROUND_DP, register, rnd
from flink_cookbook_spark.functions.time import epoch_seconds

#: watermark delay for the late-data twin (matches the streaming recipes)
LATE_DELAY_SECONDS = 600
WINDOW_SECONDS = 300
#: arrival jitter bound: +/- JITTER_SECONDS/2 around the event time
JITTER_SECONDS = 900
#: synthesized source splits (think: Kafka partitions). The watermark is
#: tracked per split, as Flink per-source-split watermarks and Spark's
#: per-partition max-event-time tracking both do.
N_INGEST_PARTITIONS = 8


def late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics as a batch query: place each event
    on a deterministic ingest partition (md5(user_id) — the keyed
    producer's placement), replay each partition in a deterministic
    jittered arrival order (event time +/- 450 s of md5-derived jitter),
    track the running max event time PER PARTITION over that order, and
    drop any record older than its partition's max minus the 10-minute
    delay — then aggregate the survivors into the pipeline's 5-minute
    windows. Output includes the number of dropped (late) events per
    window so the drop itself is value-checked, not just the surviving
    aggregate."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", epoch_seconds("ts").alias("tsl")
    )
    jitter = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % JITTER_SECONDS
        - JITTER_SECONDS // 2
    )
    ingest_pid = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % N_INGEST_PARTITIONS
    )
    arrived = ev.withColumn("arrival_ts", F.col("tsl") + jitter).withColumn(
        "ingest_pid", ingest_pid
    )
    arr = Window.partitionBy("ingest_pid").orderBy("arrival_ts", "event_id")
    with_wm = arrived.withColumn(
        "max_seen", F.max("tsl").over(arr.rowsBetween(Window.unboundedPreceding, -1))
    ).withColumn(
        "is_late",
        F.col("tsl") < F.col("max_seen") - F.lit(LATE_DELAY_SECONDS),
    )
    return (
        with_wm.groupBy(
            (F.floor(F.col("tsl") / WINDOW_SECONDS) * WINDOW_SECONDS)
            .cast("long")
            .alias("window_start"),
            "user_id",
        )
        .agg(
            F.count(F.when(~F.coalesce("is_late", F.lit(False)), 1)).alias("n_on_time"),
            F.count(F.when(F.col("is_late"), 1)).alias("n_late"),
            rnd(
                F.avg(F.when(~F.coalesce("is_late", F.lit(False)), F.col("value")))
            ).alias("avg_on_time"),
        )
    )


register(
    "late_data_drop",
    oracle=f"""
WITH jittered AS (
  SELECT event_id, user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS tsl,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
             % {JITTER_SECONDS}
           - {JITTER_SECONDS // 2} AS arrival_ts,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
             % {N_INGEST_PARTITIONS} AS ingest_pid
  FROM events
),
arr AS (
  SELECT *,
         max(tsl) OVER (
           PARTITION BY ingest_pid
           ORDER BY arrival_ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS max_seen
  FROM jittered
),
flagged AS (
  SELECT *, tsl < max_seen - {LATE_DELAY_SECONDS} AS is_late FROM arr
)
SELECT CAST(floor(tsl / {WINDOW_SECONDS}) * {WINDOW_SECONDS} AS BIGINT) AS window_start,
       user_id,
       count(*) FILTER (WHERE NOT coalesce(is_late, false)) AS n_on_time,
       count(*) FILTER (WHERE is_late) AS n_late,
       round(avg(value) FILTER (WHERE NOT coalesce(is_late, false)) + 1e-6,
             {ROUND_DP}) AS avg_on_time
FROM flagged
GROUP BY 1, 2
""",
    tags=("streaming-twin", "watermark", "late-data"),
)(late_data_drop)


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark semantics as a batch query: the
    at-least-once-delivery case where a redelivered record carries a
    NEW timestamp. We simulate redelivery by unioning events with a
    1-second-jittered copy, then collapse on the business identity
    (user_id, event_id) keeping the first arrival — exactly what the
    streaming operator does within the watermark horizon (the live twin
    is tests/test_streaming.py::test_dedup_within_watermark)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    redelivered = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 SECOND"))
    return (
        ev.unionAll(redelivered)
        .groupBy("user_id", "event_id")
        .agg(
            F.min(epoch_seconds("ts")).alias("first_arrival_ts"),
            F.count("*").alias("n_deliveries"),
        )
    )


register(
    "dedup_within_watermark",
    oracle="""
WITH deliveries AS (
  SELECT user_id, event_id, ts FROM events
  UNION ALL
  SELECT user_id, event_id, ts + INTERVAL 1 SECOND FROM events
)
SELECT user_id, event_id,
       CAST(floor(min(epoch(ts))) AS BIGINT) AS first_arrival_ts,
       count(*) AS n_deliveries
FROM deliveries
GROUP BY 1, 2
""",
    tags=("streaming-twin", "dedup", "watermark"),
)(dedup_within_watermark)
