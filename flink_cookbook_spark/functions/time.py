"""Event-time helpers: the ONE place that turns a timestamp column into
epoch seconds.

Round 3 lost 17 queries to a fixture time-encoding change because ~20 call
sites each did a bare ``.cast("long")`` on ``ts`` / ``window.start``. All
event-time epoch conversion now routes through :func:`epoch_seconds`, so
the next engine/type change is a one-line fix here, not a repo-wide sweep.

The double cast is deliberate: ``timestamp -> timestamp`` is a no-op that
Catalyst removes, while ``TIMESTAMP_NTZ -> timestamp`` is legal (the bare
``NTZ -> BIGINT`` cast is not) and value-preserving under the UTC session
TZ pinned in ``catalog.load``. So the helper stays correct even if an NTZ
column reaches an operator through a non-catalog path (streaming sources,
driver-provided frames).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (BIGINT, floor semantics) from any timestamp flavor.

    Matches the oracle convention ``CAST(floor(epoch(ts)) AS BIGINT)`` —
    Spark's timestamp->long cast truncates toward negative infinity at
    whole seconds, exactly DuckDB's ``floor(epoch(..))``.
    """
    if isinstance(col, str):
        col = F.col(col)
    return col.cast("timestamp").cast("long")


def epoch_millis(col: Column | str) -> Column:
    """Whole-second epoch milliseconds (BIGINT) — the reference's wire
    convention for ``timestamp`` / ``event_time`` fields
    (/root/reference README.md:104-110: epoch ms). Whole-second (not
    sub-second) on purpose: the hash-checked wire queries pin this shape."""
    return epoch_seconds(col) * 1000
