"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver contract: for each registered query, run the Spark
DataFrame and the oracle SQL over the same parquet fixtures, then compare
row count, column-name set, and an order-insensitive value comparison
(columns sorted by name, rows sorted by all columns). Exact equality is
required — queries are responsible for rounding floats so engine-internal
summation order cannot flip values (registry.ROUND_DP).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flink_cookbook_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types that legitimately differ in representation
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # -0.0 vs 0.0 and NaN ordering hazards
            df[c] = df[c].apply(lambda x: 0.0 if x == 0 else x)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"{name}: columns differ spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"{name}: row count spark={len(got)} oracle={len(want)}")
        return problems
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gc, wc = g[c], w[c]
        if str(gc.dtype).startswith("float") or str(wc.dtype).startswith("float"):
            bad = [
                i
                for i, (a, b) in enumerate(zip(gc, wc))
                if not (
                    (isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b))
                    or a == b
                )
            ]
        else:
            neq = gc.astype(str) != wc.astype(str)
            bad = list(neq[neq].index)
        if bad:
            i = bad[0]
            problems.append(
                f"{name}.{c}: {len(bad)} mismatched values, first at sorted-row {i}: "
                f"spark={g[c].iloc[i]!r} oracle={w[c].iloc[i]!r}"
            )
    return problems
