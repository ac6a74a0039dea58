"""Bucketing: the co-located-join lever for 100 TB fact-fact joins.

A join between two tables bucketed on the join key executes with ZERO
exchanges — the property that turns the orders x lineitem shuffle (the
dominant cost of q3/q10/q18 at scale) into a local merge. Pinned here as
a test so the engine demonstrably supports the layout.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.plans.explain import count_exchanges


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # spark.sql.warehouse.dir is static — use the session default
    # (spark-warehouse/ under cwd, gitignored).
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        load(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    yield ("orders_b", "lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = (
        spark.table(orders_b)
        .join(spark.table(lineitem_b), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    # join itself: no exchange (co-located buckets); only the final
    # aggregate may keep a partial/final split without a shuffle since
    # data is already partitioned by the key.
    assert count_exchanges(joined) == 0, "bucketed join must not shuffle"
    # correctness unchanged vs the plain-parquet join
    plain = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    orders_b, _ = bucketed_tables
    agg = spark.table(orders_b).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert count_exchanges(agg) == 0, "aggregation on the bucket key must not shuffle"
