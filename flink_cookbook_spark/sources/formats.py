"""File-format sources & sinks: parquet / CSV / JSON / ORC, batch and
streaming, plus partitioned writes.

The reference reads only Kafka or an in-process generator (SURVEY.md
section 2.2 'file-format scans: absent'); a real engine needs the file
surface. All readers take explicit schemas (never inferSchema in
production — one pass saved, types pinned); writers default to snappy
parquet, the only sane 100 TB format (columnar, pushdown, splittable).
Partitioned writes (``partitionBy``) give partition pruning on read —
the biggest single lever for selective scans at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | str | None = None, **options) -> DataFrame:
    """Schema-pinned batch read for any supported format."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_stream(spark: SparkSession, path: str, fmt: str, schema: T.StructType | str, **options) -> DataFrame:
    """Streaming file source (schema mandatory — Spark requires it)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
