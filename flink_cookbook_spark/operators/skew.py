"""Skew mitigation: salted joins (+ AQE as the first line of defense).

At 100 TB a handful of hot keys (a viral document source, a monitoring
node gone chatty) can pin a join's wall-clock to one straggler task.
First line of defense is AQE skew-join splitting (enabled in
session.get_spark); when the skew is in an *aggregation-feeding* join or
beyond AQE's split granularity, explicit salting spreads a hot key over
N subkeys: the big side gets a random salt in [0, N), the small side is
replicated N times, and the join key becomes (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on ``key`` using salt fan-out.

    The big side's hot keys scatter uniformly over ``n_salts`` partitions;
    the small side is exploded x n_salts (fine — it is the small side).
    Result columns match a plain ``big.join(small, key, how)``.

    Only ``inner`` and ``left`` (big-side-preserving) joins are valid:
    a right/full join would surface each unmatched small-side row once
    per salt replica.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the "
            "replicated small side would duplicate unmatched rows"
        )
    salted_big = big.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
