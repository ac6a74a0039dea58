"""Probe the >2^53 DECIMAL -> DOUBLE cast boundary (round-12, verdict
ask #6 — the boundary was documented at operators/tpch.py:34 but never
probed).

Claim under test: a group's money sum computed in DECIMAL is exact and
engine-identical at any scale, but the FINAL cast to DOUBLE (done for
the driver's type-sensitive hash) stops being the same operation once
the unscaled 2-dp sum exceeds 2^53 — Spark's BigDecimal.doubleValue is
correctly rounded while DuckDB's decimal->double goes through the
int128 unscaled value and a double divide (double-rounding), so they
can diverge by 1 ulp.

Three phases, one JSON line each:

1. SCAN — for unscaled cent sums S in windows below and above 2^53,
   compare DuckDB's ``CAST(DECIMAL AS DOUBLE)`` against the correctly
   rounded double of S/100 (computed exactly via fractions). Expect
   zero divergences below 2^53 and a nonzero rate above; record the
   first divergent S.
2. TWO-ENGINE GROUP SUM — build a real parquet fixture whose per-group
   DECIMAL sums land on chosen values straddling the boundary
   (including the scan's first divergent S), run the driver-identical
   comparison (tests/oracle_harness.compare) on
   ``CAST(SUM(v) AS DOUBLE)`` in both engines, and report whether the
   hash flags — the empirical red line for money queries past ~1000x.
3. REMEDIATION — same fixture, same sums, compared at DECIMAL type
   end-to-end (no double cast): must be green on BOTH sides of the
   boundary, proving the documented fix ("compare at DECIMAL
   end-to-end") is real, not hypothetical.

Run manually (~1 min): python probe_decimal53.py
Record results in PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from fractions import Fraction

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TWO53 = 1 << 53


def _correct_double(cents: int) -> float:
    """The correctly rounded IEEE double nearest cents/100, via exact
    rational arithmetic (Fraction -> float is correctly rounded)."""
    return float(Fraction(cents, 100))


def _scan(con) -> dict:
    """Compare DuckDB's DECIMAL(38,2) -> DOUBLE cast against the
    correctly rounded value in windows around 2^53 unscaled cents."""
    windows = {
        "below_2^53": range(TWO53 - 20_000, TWO53),
        "above_2^53": range(TWO53 + 1, TWO53 + 20_001),
        "10x_above": range(10 * TWO53 + 1, 10 * TWO53 + 20_001),
    }
    out: dict = {"phase": "scan"}
    first_divergent = None
    for label, rng in windows.items():
        vals = list(rng)
        # one round trip: cast every candidate in a single query. The
        # DECIMAL(38,2) is built from a STRING ("<c/100>.<c%100>") so
        # its unscaled value is exactly c — no arithmetic that could
        # itself round.
        con.execute("CREATE OR REPLACE TABLE cand(c BIGINT)")
        con.executemany("INSERT INTO cand VALUES (?)", [(v,) for v in vals])
        rows = con.execute(
            "SELECT c, CAST(CAST(CONCAT(CAST(c // 100 AS VARCHAR), '.',"
            " LPAD(CAST(c % 100 AS VARCHAR), 2, '0')) AS DECIMAL(38,2))"
            " AS DOUBLE) FROM cand"
        ).fetchall()
        div = [c for c, d in rows if d != _correct_double(c)]
        out[label] = {"checked": len(vals), "divergent": len(div)}
        if div and first_divergent is None:
            first_divergent = min(div)
    out["first_divergent_cents"] = first_divergent
    return out


def _mk_fixture(spark, out_dir: str, targets: list[int]) -> None:
    """Parquet table t(g INT, v DECIMAL(38,2)) where group g's exact
    decimal sum is targets[g] cents: two rows per group, target-1 and 1,
    so the SUM (not a literal) crosses the boundary."""
    rows = []
    for g, cents in enumerate(targets):
        rows.append((g, cents - 1))
        rows.append((g, 1))
    # exact string-built decimal (see _scan): unscaled value == cents
    df = spark.createDataFrame(rows, "g INT, cents LONG").selectExpr(
        "g",
        "CAST(CONCAT(CAST(cents DIV 100 AS STRING), '.',"
        " LPAD(CAST(cents % 100 AS STRING), 2, '0')) AS DECIMAL(38,2)) AS v",
    )
    df.coalesce(1).write.mode("overwrite").parquet(out_dir)


def main() -> None:
    import duckdb

    from flink_cookbook_spark.session import get_spark
    from tests.oracle_harness import compare

    con = duckdb.connect()
    scan = _scan(con)
    print(json.dumps(scan), flush=True)

    spark = get_spark(app_name="fcs-decimal53-probe")
    work = tempfile.mkdtemp(prefix="fcs_dec53_")
    try:
        first = scan["first_divergent_cents"] or (TWO53 + 1)
        # groups: two safely below, the boundary itself, the first
        # divergent sum, and two deep-past-boundary sums
        targets = [
            10_000_000_000,  # $100M — everyday scale
            TWO53 - 2,  # just below the boundary
            TWO53,  # exactly representable
            first,  # first divergence found by the scan
            10 * TWO53 + 1,  # an order past the boundary
            10 * TWO53 + 7,
        ]
        path = os.path.join(work, "t.parquet")
        _mk_fixture(spark, path, targets)
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{path}/*.parquet'"
        )

        # phase 2: the cast-to-double comparison (expected to FLAG past
        # the boundary — that is the point)
        got = spark.read.parquet(path).groupBy("g").agg(
            {"v": "sum"}
        ).selectExpr("g", "CAST(`sum(v)` AS DOUBLE) AS s")
        problems = compare(
            got, con, "SELECT g, CAST(SUM(v) AS DOUBLE) AS s FROM t GROUP BY g",
            "decimal53_double_cast",
        )
        print(
            json.dumps(
                {
                    "phase": "double_cast_compare",
                    "diverged": bool(problems),
                    "problems": problems[:3],
                }
            ),
            flush=True,
        )

        # per-group forensic: which sums diverge, and by how many ulps
        import math

        sdf = {r["g"]: r["s"] for r in got.collect()}
        ddf = dict(
            con.execute("SELECT g, CAST(SUM(v) AS DOUBLE) FROM t GROUP BY g").fetchall()
        )
        per_group = []
        for g, cents in enumerate(targets):
            sp, du = sdf[g], ddf[g]
            correct = _correct_double(cents)
            ulp = math.ulp(max(abs(sp), abs(du)))
            per_group.append(
                {
                    "cents": cents,
                    "past_2^53": cents > TWO53,
                    "spark_correctly_rounded": sp == correct,
                    "duckdb_correctly_rounded": du == correct,
                    "ulps_apart": abs(round((sp - du) / ulp)) if ulp else 0,
                }
            )
        print(json.dumps({"phase": "forensic", "groups": per_group}), flush=True)

        # phase 3: remediation — keep the sum DECIMAL end-to-end and
        # ship its exact STRING form to the hash. (Raw DECIMAL columns
        # do NOT survive the driver's type-sensitive hash: Spark's
        # toPandas yields dtype=object Decimals while DuckDB's fetchdf
        # yields float64 — this probe found that, so the documented
        # remediation is the string cast, which is exact and
        # type-stable in both engines.)
        got_dec = spark.read.parquet(path).groupBy("g").agg({"v": "sum"}).selectExpr(
            "g", "CAST(CAST(`sum(v)` AS DECIMAL(38,2)) AS STRING) AS s"
        )
        problems_dec = compare(
            got_dec,
            con,
            "SELECT g, CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS VARCHAR) AS s"
            " FROM t GROUP BY g",
            "decimal53_decimal_e2e",
        )
        print(
            json.dumps(
                {
                    "phase": "decimal_e2e_remediation",
                    "green": not problems_dec,
                    "problems": problems_dec[:3],
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
