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
import numpy as np
import pandas as pd


def _signbit(col: pd.Series) -> pd.Series:
    return np.signbit(col.fillna(1.0).to_numpy(dtype="float64"))


def _is_date_col(col: pd.Series) -> bool:
    import datetime

    vals = col.dropna()
    return len(vals) > 0 and isinstance(vals.iloc[0], (datetime.date, datetime.datetime))

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


#: pandas dtypes the driver's type-sensitive hash treats as equal.
#: Everything else differing (int64 vs float64 — the DuckDB HUGEINT trap)
#: is a real driver hash-fail even when values match.
_DTYPE_EQUIV = {
    "int32": "int64",  # width-only; the driver hashes python ints
    "int8": "int64",
    "int16": "int64",
    "uint64": "int64",
    "float32": "float64",
}


def _canon_dtype(dt: str) -> str:
    return _DTYPE_EQUIV.get(dt, dt)


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    name: str,
    require_rows: bool = False,
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    ``require_rows`` flags a 0-row == 0-row match as a problem (the
    vacuous-green class: both engines agreeing on the empty set
    verifies nothing about the query's logic)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"{name}: columns differ spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return problems
    # driver-hash replica: a numeric column whose KIND differs between the
    # engines (int vs float — e.g. a DuckDB HUGEINT sum fetched as float64
    # against Spark's BIGINT) flips the driver's type-sensitive value hash
    # even when every value matches. Catch it here so it can't reach CI.
    for c in got.columns:
        g, w = _canon_dtype(str(got[c].dtype)), _canon_dtype(str(want[c].dtype))
        if g == "object" and w.startswith("datetime64") and _is_date_col(got[c]):
            continue  # Spark DATE fetches as object-of-date; driver-equal
        if g != w and not (g == w == "object"):
            problems.append(
                f"{name}.{c}: dtype kind differs spark={got[c].dtype} "
                f"oracle={want[c].dtype} (driver hash is type-sensitive; "
                f"CAST the oracle — HUGEINT sums need CAST(... AS BIGINT))"
            )
    # -0.0 vs 0.0 also flips the driver hash (DuckDB round() preserves the
    # sign of zero, Spark's doesn't); _normalize erases it for sorting, so
    # count signed zeros per side first.
    for c in got.columns:
        if str(got[c].dtype).startswith("float") and str(want[c].dtype).startswith("float"):
            gz = int(((got[c] == 0) & _signbit(got[c])).sum())
            wz = int(((want[c] == 0) & _signbit(want[c])).sum())
            if gz != wz:
                problems.append(
                    f"{name}.{c}: negative-zero count differs spark={gz} "
                    f"oracle={wz} (normalize with + 0.0 after round on both sides)"
                )
    if problems:
        return problems
    if len(got) != len(want):
        problems.append(f"{name}: row count spark={len(got)} oracle={len(want)}")
        return problems
    if require_rows and len(got) == 0:
        problems.append(
            f"{name}: 0-row == 0-row oracle match — vacuous green; fix "
            "the query/fixture interaction or whitelist in VACUOUS_OK "
            "with a reason"
        )
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
