"""Python UDTF + grouped-agg pandas UDAF surface, hash-checked.

The engine's other Python escape hatches are the Arrow-batched model
operators (applyInPandas / applyInPandasWithState / mapInPandas in
streaming/sarimax.py and pipeline/multimodal.py). This module covers the
remaining two user-function shapes SURVEY.md §2.2 lists for the UDF/UDAF/
UDTF row: a table function (one row in, many rows out, LATERAL-joined)
and a grouped aggregate (pandas Series in, scalar out) — each with a
DuckDB oracle, so the Python path is value-checked, not just smoke-run.

Both computations are DELIBERATELY also expressible natively (explode +
count; exp(avg(ln))) — that is what makes them oracle-checkable, and the
native twins (top_tokens, agg_stats) document that a production pipeline
keeps hot paths JVM-side; these registrations pin that the Python API
produces identical results when users do reach for it.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd


class _WordCountsUDTF:
    """Per-document token frequency table: eval() receives one document's
    text and yields a (token, count) row per distinct token — the
    classic UDTF shape (same contract as Flink's TableFunction, which the
    reference's PyFlink API exposes but the reference never uses).

    Wrapped with ``udtf(returnType=...)`` lazily inside the query fn:
    the decorator parses its DDL schema against the ACTIVE session, so
    decorating at import time would require a SparkSession to exist
    before the registry can even enumerate queries."""

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        if not text:
            return
        counts: dict[str, int] = {}
        for tok in text.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
        for tok, cnt in counts.items():
            yield tok, cnt


def python_udtf_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied per corpus row via LATERAL join. Row-at-a-time
    by nature (the UDTF protocol); the oracle proves output parity with
    the relational form, and ``top_tokens``/``tf_idf`` are the native
    explode+agg twins a hot path should use."""
    docs = load(spark, sf_dir, "documents")
    spark.udtf.register(
        "fcs_word_counts", udtf(_WordCountsUDTF, returnType="token string, cnt bigint")
    )
    docs.createOrReplaceTempView("_fcs_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.token, w.cnt
        FROM _fcs_udtf_docs d, LATERAL fcs_word_counts(d.text) w
        """
    )


register(
    "python_udtf_word_counts",
    oracle="""
SELECT doc_id, token, count(*) AS cnt
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY 1, 2
""",
    tags=("udf", "udtf", "python"),
)(python_udtf_word_counts)


def _geomean_fn(v: pd.Series) -> float:
    """Grouped-agg pandas UDAF body: geometric mean via exp(mean(log)) —
    Arrow-batched, one scalar per group. Wrapped with pandas_udf lazily
    (schema parsing needs an active session, same as the UDTF above)."""
    import numpy as np

    if len(v) == 0:
        return float("nan")
    return float(math.exp(np.log(v.to_numpy()).mean()))


def _count_fn(v: pd.Series) -> int:
    return len(v)


def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user geometric mean of event values through the grouped-agg
    pandas UDF path (SUM/AVG-style custom aggregate in Python, Arrow
    transfer, one invocation per group partition)."""
    # geometric mean is defined on positive support: filter value > 0 on
    # BOTH sides (a zero would be ln(0): -inf silently in numpy, an
    # OutOfRange ERROR in DuckDB — the fixture's sf0.1 generation does
    # contain one zero).
    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    geomean = pandas_udf(_geomean_fn, "double")
    # Spark disallows mixing group-agg pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # group size is a pandas aggregate too. The Series -> scalar type
    # hints are what make pandas_udf infer GROUPED_AGG (a bare lambda
    # would be inferred SCALAR and fail analysis).
    n_rows = pandas_udf(_count_fn, "long")
    return ev.groupBy("user_id").agg(
        n_rows("value").alias("n_events"),
        rnd(geomean("value"), 4).alias("geomean_value"),
    )


register(
    "pandas_udaf_geomean",
    oracle="""
SELECT user_id,
       count(value) AS n_events,
       round(exp(avg(ln(value))) + 1e-6, 4) AS geomean_value
FROM events
WHERE value > 0
GROUP BY user_id
""",
    tags=("udf", "udaf", "pandas", "python"),
)(pandas_udaf_geomean)


#: cogroup key buckets: cogrouped applyInPandas makes ONE Python call
#: per group, so grouping on the raw user_id costs n_users calls — the
#: per-call overhead (frame assembly + merge_asof setup, ~5 ms) dwarfed
#: the work at 1500 fixture users (≈9.8 s at sf0.1). Bucketing the
#: cogroup key to user_id % N bounds the call count at N per job while
#: ``merge_asof(by="user_id")`` keeps the merge per-user inside each
#: bucket — identical output, ~3x faster at sf0.1, and at 100 TB the
#: Python call count stays N instead of scaling with key cardinality.
COGROUP_BUCKETS = 64


def cogroup_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the remaining Arrow-batched pandas
    surface (after scalar/UDAF/UDTF/mapInPandas/applyInPandasWithState):
    ``df.groupby(k).cogroup(other.groupby(k)).applyInPandas(merge)``.
    Each purchase event is enriched with the user's latest prior view
    (backward as-of) via ``pandas.merge_asof`` per user — the pandas-
    native expression of the engine's J1 as-of machinery, useful when
    the per-key merge logic outgrows what a window expression can say.

    Scale shape: ONE hash exchange per side (both co-partition on the
    bucketed key), then Arrow hands each bucket's two frames to one
    Python worker; ``merge_asof(by=user_id)`` runs the per-user as-of
    inside the bucket, so Python is called COGROUP_BUCKETS times per
    job, not once per user (see COGROUP_BUCKETS). Per-call state is one
    bucket's rows (~corpus / N), never the corpus. The hash-green
    result is cross-checked against DuckDB's native ASOF JOIN.
    """
    ev = load(spark, sf_dir, "events")
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    bucket = F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)).cast("int")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", sec.alias("t"), "value", bucket.alias("bucket")
    )
    views = ev.where(F.col("event_type") == "view").select(
        # distinct name: when the cogroup key is NOT this column, Spark's
        # FlatMapCoGroupsInPandas silently drops a right-side attribute
        # whose name collides with a left-side one — rename, restore in
        # pandas
        F.col("user_id").alias("v_user_id"),
        sec.alias("vt"), F.col("value").alias("view_value"),
        bucket.alias("bucket"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values(["t", "user_id", "event_id"]).reset_index(drop=True)
        right = (
            right.rename(columns={"v_user_id": "user_id"})
            .sort_values(["user_id", "vt", "view_value"])
            # ties on (user, vt): keep the LAST (max view_value) like MAX_BY
            .drop_duplicates(subset=["user_id", "vt"], keep="last")
            .sort_values("vt", kind="mergesort")  # merge_asof needs on-key order
            .reset_index(drop=True)
        )
        if right.empty:
            out = left.copy()
            out["view_t"] = pd.array([None] * len(left), dtype="Int64")
            out["view_value"] = float("nan")
            return out[["user_id", "event_id", "t", "value", "view_t", "view_value"]]
        merged = pd.merge_asof(
            left,
            right.rename(columns={"vt": "view_t"})[["user_id", "view_t", "view_value"]],
            left_on="t",
            right_on="view_t",
            by="user_id",  # per-user as-of within the bucket
            direction="backward",
            allow_exact_matches=False,  # strictly BEFORE the purchase
        )
        merged["view_t"] = merged["view_t"].astype("Int64")
        return merged[["user_id", "event_id", "t", "value", "view_t", "view_value"]]

    out_schema = (
        "user_id long, event_id long, t long, value double, "
        "view_t long, view_value double"
    )
    enriched = (
        purchases.groupby("bucket")
        .cogroup(views.groupby("bucket"))
        .applyInPandas(merge, schema=out_schema)
    )
    return enriched.select(
        "user_id",
        "event_id",
        "t",
        rnd("value", 4).alias("value"),
        "view_t",
        rnd("view_value", 4).alias("view_value"),
    )


register(
    "cogroup_asof_enrich",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
  FROM events WHERE event_type = 'purchase'
),
v AS (
  -- dedupe exact-tie view timestamps keeping max value (MAX_BY), the
  -- same rule the pandas merge applies before the as-of
  SELECT user_id, vt, max(view_value) AS view_value FROM (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS vt,
           value AS view_value
    FROM events WHERE event_type = 'view'
  ) GROUP BY user_id, vt
)
SELECT p.user_id, p.event_id, p.t,
       round(p.value + 1e-6, 4) AS value,
       v.vt AS view_t,
       round(v.view_value + 1e-6, 4) AS view_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.t > v.vt
""",
    tags=("pyudf", "cogroup", "asof", "arrow", "bench"),
)(cogroup_asof_enrich)


def _sig_fn(lang: str, source: str, n_chars: int) -> str:
    """Arrow-optimized scalar UDF body: a string signature a tokenizer
    router might compute — pure Python per row, shipped in Arrow
    batches."""
    return f"{lang.upper()}/{source[-1]}:{n_chars % 97}"


def arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-optimized Python UDF (``udf(..., useArrow=True)``)
    — the third scalar-UDF tier (JVM builtin > pandas UDF > arrow UDF >
    pickled row UDF): per-row Python semantics with Arrow batch
    transfer instead of pickle. Registered with a relational oracle that
    recomputes the same signature in SQL, proving value parity for the
    surface a user reaches when per-row logic resists vectorization.
    """
    sig = F.udf(_sig_fn, "string", useArrow=True)
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id", sig("lang", "source", "n_chars").alias("sig")
    )
    return per_doc.groupBy("sig").agg(F.count("*").alias("n_docs"))


register(
    "arrow_python_udf",
    oracle="""
SELECT upper(lang) || '/' || substring(source, length(source), 1)
         || ':' || CAST(n_chars % 97 AS VARCHAR) AS sig,
       count(*) AS n_docs
FROM documents
GROUP BY sig
""",
    tags=("udf", "arrow", "python"),
)(arrow_python_udf)
