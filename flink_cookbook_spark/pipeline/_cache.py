"""Session-scoped memoized materialization for shared pipeline intermediates.

The dedup family reuses a handful of derived tables — the shingle index,
MinHash signatures, SimHash signatures — several times per query (self-
joins) and across queries (LSH pairs -> clusters). Left lazy, Catalyst
re-derives them at every use: minhash_lsh_pairs alone planned 12 parquet
scans and 16 explodes of the same shingle pipeline (exchange reuse does
not fire across the differing aggregates). A 100 TB pipeline materializes
these indexes ONCE and reuses them across every downstream stage; this
helper is the in-memory analogue — ``persist()`` + memoize per
(session, sf_dir), so the explode/aggregate runs once and every later
use (including other registered queries in the same session, via
Spark's plan-based cache substitution) reads the materialized form.

Results are unaffected: the cached DataFrame is the same logical plan,
and the driver/oracle comparisons run per-session where memoization is
transparent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}


def memo_persist(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return a persisted DataFrame for (kind, sf_dir), building it at
    most once per session. A stale entry from a stopped/replaced session
    is rebuilt."""
    key = (kind, sf_dir)
    cached = _CACHE.get(key)
    if cached is not None and cached.sparkSession is spark:
        return cached
    df = build().persist()
    _CACHE[key] = df
    return df
