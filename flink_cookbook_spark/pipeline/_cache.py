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

Staleness assumption: entries are keyed by (kind, sf_dir) and never
invalidated within a live session — if a fixture directory is
regenerated mid-session, call ``clear()`` (or restart the session) or
the pipeline keeps serving results derived from the old files. The
module-level dicts are unsynchronized: single-threaded driver use only
(the driver and bench are single-threaded; concurrent first-builds
would at worst persist the same plan twice).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}
_VALUES: dict[tuple[str, str], tuple[SparkSession, Any]] = {}


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


def memo_value(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    build: Callable[[], Any],
) -> Any:
    """Memoize a driver-sized plain value derived from (kind, sf_dir) —
    e.g. a trained k x DIM centroid matrix — with the same session-
    staleness rule as memo_persist."""
    key = (kind, sf_dir)
    hit = _VALUES.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    value = build()
    _VALUES[key] = (spark, value)
    return value


def clear() -> None:
    """Release every memoized intermediate: unpersist cached DataFrames
    (blocking, so executor storage is actually freed) and drop memoized
    values. Call when a session outlives a fixture directory (rewrite /
    long-lived service) or in bench teardown."""
    for df in _CACHE.values():
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass  # session already stopped — nothing holds storage
    _CACHE.clear()
    _VALUES.clear()
