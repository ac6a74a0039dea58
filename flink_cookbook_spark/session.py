"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N] (single JVM); the config is nonetheless
written for a real cluster: AQE handles runtime re-planning (partition
coalescing, skew-join splitting), shuffle partitions default to the local
core count but should be ~2-3x total executor cores on a cluster, and the
session timezone is pinned to UTC so results are reproducible and
comparable against the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_cookbook_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At 100 TB these same knobs apply — only the values change:
    ``spark.sql.shuffle.partitions`` ~ 2-3x total cores (AQE coalesces
    down), ``spark.sql.files.maxPartitionBytes`` sized so a scan task's
    input fits comfortably in executor memory.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size post-shuffle partitions by data volume (advisory 64 MB
        # target), not by the cluster's default parallelism — the Spark
        # tuning guide's recommended production setting. A 3 MB aggregate
        # becomes 1 partition instead of 32 near-empty tasks; a 10 GB
        # shuffle still fans out to ~160.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # let AQE re-plan (and coalesce) CACHED plans too: persisted
        # intermediates (the 5-min windowed aggregate, the shingle index)
        # otherwise keep shuffle-partition-count slices forever, and every
        # downstream consumer pays per-task overhead proportional to the
        # ORIGINAL parallelism rather than the data size.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
