"""Fixture schema contract: ``catalog.load`` must hand every operator a
NORMALIZED schema regardless of how the driver's fixture regeneration
encoded it on disk (nanos-as-long, us-NTZ, us-LTZ have all shipped).

A future fixture regeneration that changes the parquet time encoding must
fail HERE, in-repo, not in the driver's correctness run (the round-3
outage: ``timestamp[us]`` fixtures surfaced as TIMESTAMP_NTZ, and
``cast(ntz AS BIGINT)`` is an AnalysisException that broke 17 queries).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cookbook_spark import catalog

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

#: columns that must come out as session-TZ TimestampType — never NTZ,
#: never raw long — so epoch casts and window() semantics work everywhere.
TIME_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

FORBIDDEN = (T.TimestampNTZType,)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", catalog.TABLES)
def test_normalized_schema(spark, sf_dir, table):
    df = catalog.load(spark, sf_dir, table)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    # no NTZ may survive normalization on ANY column
    for name, dtype in by_name.items():
        assert not isinstance(dtype, FORBIDDEN), (
            f"{table}.{name} is {dtype} after load(); catalog.load must "
            "normalize it to session-TZ TimestampType"
        )
    for col in TIME_COLUMNS.get(table, ()):
        assert isinstance(by_name[col], T.TimestampType), (
            f"{table}.{col} must normalize to TimestampType, got {by_name[col]}"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS[:1])
def test_epoch_cast_analyzes_and_matches_duckdb(spark, sf_dir):
    """The load-bearing property behind every windowed query: a normalized
    ``ts`` must cast to epoch seconds, and those values must equal what
    DuckDB sees reading the same parquet as naive-UTC timestamps."""
    import duckdb

    ev = catalog.load(spark, sf_dir, "events")
    got = [
        r.e
        for r in ev.select(F.col("ts").cast("long").alias("e"))
        .orderBy("e")
        .limit(5)
        .collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e FROM "
            f"read_parquet('{sf_dir}/events.parquet') ORDER BY e LIMIT 5"
        ).fetchall()
    ]
    assert got == want


def test_epoch_seconds_uniform_across_encodings(spark, tmp_path):
    """functions.time.epoch_seconds must return identical values whether
    the column arrives as TimestampType, TIMESTAMP_NTZ, or epoch-seconds
    long — the invariant that makes the round-3 fixture-encoding outage
    structurally unrepeatable."""
    from flink_cookbook_spark.functions.time import epoch_millis, epoch_seconds

    want = [1704067200, 1704070800, 1704074399]
    base = spark.createDataFrame([(v,) for v in want], "tsl long")
    as_ts = base.select(F.timestamp_seconds("tsl").alias("c"))
    as_ntz = base.select(
        F.timestamp_seconds("tsl").cast("timestamp_ntz").alias("c")
    )
    as_long = base.select(F.col("tsl").alias("c"))
    for df in (as_ts, as_ntz, as_long):
        got = [r.e for r in df.select(epoch_seconds("c").alias("e")).orderBy("e").collect()]
        assert got == want, df.schema
    got_ms = [
        r.e for r in as_ntz.select(epoch_millis("c").alias("e")).orderBy("e").collect()
    ]
    assert got_ms == [v * 1000 for v in want]
