"""Streaming + batch sources: Kafka builder, synthetic metric generator,
file streams.

Twins of the reference's sources (SURVEY.md S1-S3):
- S1 Kafka consumer (flinkarima.py:379-389) -> ``kafka_metrics_stream``:
  same topic/offset semantics via Structured Streaming options. Not
  testable in this container (no broker) — construction-only.
- S2/S3 synthetic generator (flinkarima.py:45-118, datagen.py:25-76) ->
  pure column expressions over ``spark.range`` (batch) or the rate
  source (streaming): per-node base U(30,70), hour-of-day factor,
  minute variation, U(-5,5) noise, 1% spike +U(30,50), clamp [0,100].
  ``rand(seed)`` makes the batch twin deterministic and oracle-friendly
  (the reference's wall-clock/random calls are the non-determinism we
  must design out — SURVEY.md section 7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.registry import register, rnd

#: reference defaults: 5 nodes, 2 msg/s (datagen.py:166-171)
N_NODES = 5
SEED = 42


def kafka_metrics_stream(
    spark: SparkSession,
    topic: str = "node-metrics",
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: Kafka JSON source -> parsed metric rows. Mirrors
    build_consumer (flinkarima.py:379-389): same topic, offset-reset
    semantics; group management is Spark-internal (checkpoint-based).

    Requires the spark-sql-kafka package on the classpath; this container
    has no broker, so the builder is exercised only for plan shape.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_metrics(raw.select(F.col("value").cast("string").alias("value")))


METRIC_JSON_SCHEMA = "node_id STRING, cpu_utilization DOUBLE, timestamp BIGINT"


def parse_metrics(raw: DataFrame) -> DataFrame:
    """P1: JSON string -> typed rows (flinkarima.py:121-127). The
    reference throws on missing required fields (dropping the record);
    from_json yields null — the validity filter reproduces drop
    semantics. ``timestamp`` defaults to 0 like the reference."""
    j = F.from_json("value", METRIC_JSON_SCHEMA)
    return (
        raw.select(
            j.getField("node_id").alias("node_id"),
            j.getField("cpu_utilization").alias("cpu"),
            F.coalesce(j.getField("timestamp"), F.lit(0)).alias("event_time"),
        )
        .where(F.col("node_id").isNotNull() & F.col("cpu").isNotNull())
        # native event time for watermarks/windows downstream (the
        # reference's ms epoch; 0-default rows land at 1970 like the
        # reference's parse fallback)
        .withColumn("ts", F.timestamp_millis(F.col("event_time")))
    )


def _cpu_expr(ts_col: str, node_col: str, seed: int) -> F.Column:
    """The generator's value model as deterministic expressions
    (flinkarima.py:79-99 + datagen.py:45-76)."""
    hour = F.hour(F.col(ts_col))
    minute = F.minute(F.col(ts_col))
    base = 30.0 + F.pmod(F.xxhash64(F.col(node_col)).cast("double"), F.lit(40.0))
    hour_factor = (
        F.when(hour < 6, 0.4)
        .when(hour < 9, 0.6)
        .when(hour < 17, 1.2)
        .when(hour < 22, 0.8)
        .otherwise(0.5)
    )
    minute_variation = 1.0 + (minute % 15).cast("double") * 0.02
    noise = F.rand(seed) * 10.0 - 5.0
    spike = F.when(F.rand(seed + 1) < 0.01, 30.0 + F.rand(seed + 2) * 20.0).otherwise(0.0)
    cpu = base * hour_factor * minute_variation + noise + spike
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(100.0), cpu)), 2)


def synthetic_metrics_batch(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_nodes: int = N_NODES,
    rate_per_node: float = 2.0,
    seed: int = SEED,
) -> DataFrame:
    """S2/S3 batch twin: deterministic synthetic node metrics. Timestamps
    advance at ``rate_per_node`` msgs/s/node from a fixed origin, exactly
    one row per (tick, node) like the generator loop (datagen.py:110-139)."""
    base = spark.range(n_rows).select(
        (F.col("id") % n_nodes).alias("node_no"),
        (F.col("id") / n_nodes).cast("long").alias("tick"),
    )
    ts = F.timestamp_seconds(
        F.lit(1704067200) + (F.col("tick") / F.lit(rate_per_node)).cast("long")
    )
    df = base.select(
        F.concat(F.lit("node-"), F.lpad(F.col("node_no").cast("string"), 2, "0")).alias(
            "node_id"
        ),
        ts.alias("ts"),
    )
    return df.select(
        "node_id",
        "ts",
        _cpu_expr("ts", "node_id", seed).alias("cpu"),
        (F.col("ts").cast("long") * 1000).alias("event_time"),
    )


def synthetic_metrics_stream(
    spark: SparkSession,
    rows_per_second: int = 10,
    n_nodes: int = N_NODES,
    seed: int = SEED,
    micro_batch: bool = False,
) -> DataFrame:
    """S2 streaming twin: rate source -> the same value-model expressions.
    10 rows/s default == the reference's 5 nodes x 2 msg/s.
    ``micro_batch=True`` uses rate-micro-batch: a deterministic timestamp
    grid (fixed start/advance per batch) instead of wall-clock time.
    Note Spark re-seeds rand() per streaming run, so the noise component
    is per-run even on the deterministic grid; the batch twin
    (synthetic_metrics_batch) is the fully deterministic oracle-checked
    form."""
    if micro_batch:
        rate = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_second)
            .option("startTimestamp", "1704067200000")
            .option("advanceMillisPerBatch", "1000")
            .load()
        )
    else:
        rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    df = rate.select(
        F.concat(
            F.lit("node-"), F.lpad((F.col("value") % n_nodes).cast("string"), 2, "0")
        ).alias("node_id"),
        F.col("timestamp").alias("ts"),
    )
    return df.select(
        "node_id",
        "ts",
        _cpu_expr("ts", "node_id", seed).alias("cpu"),
        (F.col("ts").cast("long") * 1000).alias("event_time"),
    )


def metrics_to_json(df: DataFrame) -> DataFrame:
    """S3's wire format: {node_id, cpu_utilization, timestamp} JSON
    strings (datagen.py:129-133), ready for a Kafka value column."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("node_id"),
                F.col("cpu").alias("cpu_utilization"),
                F.col("event_time").alias("timestamp"),
            )
        ).alias("value")
    )


def synthetic_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered twin of S2/S3: deterministic generator output profile —
    per-node count, mean/min/max cpu over a fixed 10k-row run. Rows-only
    (rand(seed) sequences are Spark-internal and not reproducible in
    DuckDB); value-model properties are pytest-checked
    (tests/test_streaming.py)."""
    df = synthetic_metrics_batch(spark, n_rows=10_000)
    return df.groupBy("node_id").agg(
        F.count("*").alias("n_msgs"),
        rnd(F.avg("cpu")).alias("avg_cpu"),
        rnd(F.min("cpu"), 2).alias("min_cpu"),
        rnd(F.max("cpu"), 2).alias("max_cpu"),
    )


register("synthetic_metrics", oracle=None, tags=("source", "S2", "S3"))(
    synthetic_metrics_query
)


def json_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 -> P1 parity: serialize the synthetic batch to the reference's
    JSON wire format, parse it back (P1), and verify losslessness as an
    aggregate over 10k messages."""
    gen = synthetic_metrics_batch(spark, n_rows=10_000)
    parsed = parse_metrics(metrics_to_json(gen))
    return parsed.groupBy("node_id").agg(
        F.count("*").alias("n_msgs"),
        rnd(F.avg("cpu")).alias("avg_cpu"),
    )


register("json_wire_roundtrip", oracle=None, tags=("source", "P1", "P2"))(
    json_roundtrip_query
)
