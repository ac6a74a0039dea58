"""Query registry: every engine operator registers a named query + oracle.

Each operator from SURVEY.md section 2 that is SQL-expressible registers
both a Spark callable ``(spark, sf_dir) -> DataFrame`` and the equivalent
ANSI SQL (runnable by DuckDB over the same parquet tables). The driver —
and our own tests/test_oracle.py — compare the two (row count + schema +
order-insensitive value hash).

Discipline enforced here (driver contract, __spark_entry__.py):
- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (ROUND_DP decimals) on both sides
  so engine-internal summation order can never flip the hash;
- timestamps are projected as epoch seconds (BIGINT) or formatted strings
  so timezone/precision representation can never flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: decimal places used when rounding float aggregates on BOTH sides.
ROUND_DP = 4

#: nudge added before rounding on BOTH sides. Spark rounds via BigDecimal
#: HALF_UP on the shortest decimal representation; DuckDB rounds on the
#: binary double — they disagree when a value (e.g. an average of 4-dp
#: inputs with an even divisor, or a money SUM ending in .xx5) lands
#: exactly on a rounding tie. The nudge must exceed the engines'
#: summation-order divergence (observed up to ~1e-8 on 1e7-magnitude
#: sums at sf0.1 — why 1e-9 was not enough) while staying at or below
#: the smallest rounding quantum used (1e-6 at dp=6); at dp=6 it is a
#: uniform one-quantum shift applied identically on both sides, so
#: comparisons still match.
NUDGE = 1e-6


def rnd(col, dp: int = ROUND_DP):
    """Spark-side tie-stable rounding; SQL twin: ``round((x) + {NUDGE}, dp)``
    — every oracle must use the same ``NUDGE`` literal (1e-6, see above) or
    rounding ties can flip the value hash."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(NUDGE), dp)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => driver records rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def _driver_evidence(root: str | None = None) -> tuple[dict[str, dict], dict[str, int], int]:
    """Read the driver's own CORRECTNESS_r*.json artifacts (repo root).

    Returns (latest per-query record, per-query round number of that
    latest record, highest round number recorded). Derived from the
    artifacts rather than a hand-maintained snapshot so the 'already
    verified' set can never drift from what the driver actually
    observed — a query that regresses in a later round automatically
    loses verified status because the LATEST record per name wins.
    """
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # sort by the round number EMBEDDED IN THE FILENAME, not lexically or
    # positionally: _r10 must sort after _r9, and deleting/regenerating an
    # early artifact must not shift which round later greens map to (that
    # would silently change every REVERIFY_AFTER gate).
    def _round_of(path: str) -> int:
        m = re.search(r"_r(\d+)\.json$", path)
        return int(m.group(1)) if m else 0

    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=_round_of)
    merged: dict[str, dict] = {}
    last_round: dict[str, int] = {}
    max_round = 0
    for path in files:
        rno = _round_of(path)
        if rno <= 0:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        max_round = max(max_round, rno)
        for name, rec in data.items():
            if isinstance(rec, dict):
                merged[name] = rec
                last_round[name] = rno
    return merged, last_round, max_round


#: queries whose OUTPUT SEMANTICS changed after the driver's last green
#: record for them: name -> round count at the time of the change. A
#: green recorded in or before that round no longer describes the
#: current query, so the entry forces re-pend until the driver records
#: a LATER result (then the gate self-clears; stale entries are
#: harmless). Only list queries whose VALUES changed — plan-only or
#: comment changes keep old greens valid.
REVERIFY_AFTER: dict[str, int] = {
    # round 6: every 8th doc now carries a real BMP payload through the
    # vendored decoder — different stats rows than the all-stub output
    "multimodal_features": 5,
    # round 6: + 0.0 signed-zero normalization on the acf columns
    "autocorrelation": 5,
    # round 7: sample modulus now derived from the corpus count (capped,
    # scale-safe), thresholds widened to the fixture's cosine range, and
    # the sweep re-expressed as conditional aggregation so all 5 rows
    # always emit — the r6 green was a vacuous 0-row == 0-row match
    "similarity_threshold_curve": 6,
    # round 7: same vacuous-green class, found by the new >=1-row oracle
    # lint — anti-join now excludes URGENT-order customers (real rows;
    # the unfiltered form matched empty sets), and the LSH dup confirm
    # threshold moved inside the fixture's cosine range (0.95 -> 0.35)
    "join_anti": 6,
    "embedding_cosine_dup_pairs": 6,
    # round 9: quartile scores now come from broadcast discrete
    # percentile cutpoints instead of three global ntile windows — tied
    # values share a score (value-quantiles, not equal-count buckets),
    # so r/f/m_score and segment values differ from the ntile form
    "rfm_segments": 8,
    # round 10: p05/p95 cutpoints moved from interpolated percentiles
    # to discrete order statistics (the 10x probe caught the engines'
    # interpolation arithmetic diverging by an ulp exactly on a
    # boundary tie-mass) — cutpoint values, clip counts, and the
    # winsorized mean all shift slightly
    "winsorized_stats": 9,
    # round 11: rewritten from Spark's value-buffering exact
    # ``percentile`` (whose serialized partials killed the 30x-probe
    # JVM) to the distributed two-pass distinct-value order statistic.
    # Interpolation now evaluates lo + frac*(hi - lo) (DuckDB's
    # expression) instead of Percentile's lo*(1-frac) + hi*frac — can
    # differ by an ulp, which a rounding tie could surface, so the old
    # green does not vouch for the new arithmetic.
    "exact_quantiles": 10,
    # round 11: same conversion for the other two unbounded-cardinality
    # exact-percentile users (conversion latencies ~all-distinct per
    # user; part revenues ~all-distinct per part) — identical
    # ulp-of-interpolation caveat as exact_quantiles above.
    "funnel_time_to_convert": 10,
    # (abc_xyz_classification's round-11 entry superseded by its
    # round-13 entry below — one key, the later round)
    # round 11: per-decile revenue converted to the DECIMAL money sum
    # (the 100x heavy-table sweep flipped a cent at 4.6e11 money units
    # in the double sum) and shares now divide the exact decimal-cast
    # doubles — decile_rev/rev_share/cum/lift can all move in the last
    # rounded digit vs the old double arithmetic.
    "decile_lift_table": 10,
    # round 11: the rest of the 100x heavy-table sweep's cent-flip
    # harvest — money sums converted to the DECIMAL discipline, so the
    # rounded money outputs (and gini's shares, whose denominators now
    # come from the exact decimal) can move in the last digit
    "q17_small_quantity_revenue": 10,
    "q19_disjunctive_predicates": 10,
    "orc_scan_roundtrip": 10,
    "schema_evolution_scan": 10,
    "parameterized_sql_query": 10,
    "revenue_concentration_gini": 10,
    # round 12: SS columns re-scaled per observation (ssb_per_obs /
    # ssw_per_obs) — the 1000x tail sweep caught the raw extensive SS
    # totals diverging at the 14th significant digit at 100M rows,
    # which no fixed-dp rounding absorbs; column names and values both
    # changed.
    "anova_oneway": 11,
    # round 12: proactive DECIMAL conversion of the remaining raw
    # double money sums whose per-group row counts grow with the
    # corpus (the q1/q6 cent-flip class, same audit that drove the
    # r11 conversions): agg_stats.weighted and cohort_ltv_curve's
    # rev/cum_ltv — the rounded money outputs can move in the last
    # digit vs the old double arithmetic.
    "agg_stats": 11,
    "cohort_ltv_curve": 11,
    # round 12 (late): partitioned_scan_pruning FLIPPED 2 cents at
    # 2.5e12 money units in the 1000x tail sweep — its raw double
    # sum_price (and the same pattern in csv_scan_roundtrip,
    # yoy_segment_growth's segment-year revenue, and value_at_risk's
    # daily revenue diffs) converted to the DECIMAL discipline.
    "partitioned_scan_pruning": 11,
    "csv_scan_roundtrip": 11,
    "yoy_segment_growth": 11,
    "value_at_risk": 11,
    # round 13: revenue_share_hierarchy was the LAST raw discounted-
    # price sum in the package — the r12 reconciliation sweep caught
    # 16/25 nation rows flipping cents at ~1.17e12 at 1000x. Converted
    # to the DECIMAL discipline (exact decimal sum + decimal window
    # sums, cast to double only for the share divisions), so revenue
    # and both share columns can move in the last rounded digit.
    "revenue_share_hierarchy": 12,
    # round 13: the follow-up grep for raw money sums whose GROUP grain
    # does not scale with sf (fixed-dim keys) converted two more:
    # window_running_frames' per-supplier running revenue (prefix sums
    # over a fixed supplier catalog) and abc_xyz_classification's
    # per-part revenue (which also feeds its class cutpoints — the old
    # 4-dp pre-round of a raw double sum could move a part across a
    # class boundary at scale). Rounded outputs / class assignments can
    # move in the last digit vs the double arithmetic.
    "window_running_frames": 12,
    "abc_xyz_classification": 12,
    # hill_tail_index needs NO entry for its round-11 try_divide fix:
    # the NULL branch only fires when the top-(k+1) order statistics
    # are ALL ties (a >=100x-replication artifact); at driver scale the
    # division is unchanged, so existing greens still describe it.
    # logistic_churn_baseline needs NO entry despite its round-9 AUC
    # rewrite (exact midrank Mann-Whitney -> 1e6-cell binned): its ONLY
    # driver record is CORRECTNESS_r09, taken AFTER the rewrite, so the
    # stored hash already describes the current (binned) form — an
    # entry of 8 would be a no-op and an entry of 9 would wrongly
    # discard a valid green.
}


def _verified_names() -> frozenset[str]:
    """Names the driver has verified in their CURRENT form: hash-green,
    or cleanly rows-only-checked for a query that still registers no
    oracle (upgrading a rows-only query to an oracle re-pends it, and
    ``REVERIFY_AFTER`` re-pends semantics changes the artifacts cannot
    see)."""
    _ensure_loaded()
    evidence, last_round, _ = _driver_evidence()
    out = set()
    for name, rec in evidence.items():
        spec = _REGISTRY.get(name)
        if spec is None:
            continue
        if last_round.get(name, 0) <= REVERIFY_AFTER.get(name, 0):
            continue  # green predates a semantics change — re-pend
        if rec.get("hash_match"):
            if spec.oracle is not None:
                out.add(name)
        elif (
            rec.get("err") == "no_oracle"
            and (rec.get("spark_rows") or 0) > 0
            and spec.oracle is None
        ):
            out.add(name)
    return frozenset(out)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import every operator module so registrations run."""
    import flink_cookbook_spark.operators.graph  # noqa: F401
    import flink_cookbook_spark.operators.metrics  # noqa: F401
    import flink_cookbook_spark.operators.mleval  # noqa: F401
    import flink_cookbook_spark.operators.relational  # noqa: F401
    import flink_cookbook_spark.operators.skew  # noqa: F401
    import flink_cookbook_spark.operators.timeseries  # noqa: F401
    import flink_cookbook_spark.operators.tpch  # noqa: F401
    import flink_cookbook_spark.operators.windows  # noqa: F401
    import flink_cookbook_spark.functions.collections  # noqa: F401
    import flink_cookbook_spark.functions.pyudf  # noqa: F401
    import flink_cookbook_spark.functions.scalars  # noqa: F401
    import flink_cookbook_spark.pipeline.curation  # noqa: F401
    import flink_cookbook_spark.pipeline.dedup  # noqa: F401
    import flink_cookbook_spark.pipeline.similarity  # noqa: F401
    import flink_cookbook_spark.pipeline.text  # noqa: F401
    import flink_cookbook_spark.pipeline.multimodal  # noqa: F401
    import flink_cookbook_spark.pipeline.retrieval  # noqa: F401
    import flink_cookbook_spark.pipeline.sampling  # noqa: F401
    import flink_cookbook_spark.sources.formats  # noqa: F401
    import flink_cookbook_spark.sources.pydatasource  # noqa: F401
    import flink_cookbook_spark.streaming.sarimax  # noqa: F401
    import flink_cookbook_spark.streaming.sources  # noqa: F401
    import flink_cookbook_spark.streaming.twins  # noqa: F401

    # round-8 flip: the round-7 prepared cohort registers here (the
    # call is idempotent — see pipeline/prepared.py docstring). The
    # prepared module bootstraps composed oracles through get_query()
    # during ITS import, which re-enters this function; skip while it
    # is mid-import (no `activate` attribute yet) — the outer frame's
    # import completes and activates.
    import sys

    _mod = sys.modules.get("flink_cookbook_spark.pipeline.prepared")
    if _mod is None or hasattr(_mod, "activate"):
        from flink_cookbook_spark.pipeline import prepared

        prepared.activate()


def get_query(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]


def proven_sort_key(name: str, last_round: dict[str, int], n_rounds: int):
    """LRU-with-rotation ordering for the proven tail: least-recently
    PROVED first (so a query's re-proof gap is bounded by
    ceil(n_proven / window) rounds — plain md5 rotation alone leaves the
    gap unbounded in principle), ties broken by a per-round md5 rotation
    so same-round cohorts don't freeze into one fixed order."""
    import hashlib

    return (
        last_round.get(name, 0),
        hashlib.md5(f"{n_rounds}:{name}".encode()).hexdigest(),
    )


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, ordered for the driver's bounded (~50-entry)
    per-round correctness window: never-verified / regressed / upgraded
    queries FIRST (registration order preserved), then the proven set
    least-recently-proved first (``proven_sort_key``) — so every round
    covers all new ground, re-proves the stalest ~40 greens, and no
    green query's latest driver record can age past
    ceil(n_queries / window) + 1 rounds (tests/test_robustness.py pins
    the bound by simulation)."""
    _ensure_loaded()
    verified = _verified_names()
    _, last_round, n_rounds = _driver_evidence()
    pending = {n: s for n, s in _REGISTRY.items() if n not in verified}
    proven_names = sorted(
        (n for n in _REGISTRY if n in verified),
        key=lambda n: proven_sort_key(n, last_round, n_rounds),
    )
    return {**pending, **{n: _REGISTRY[n] for n in proven_names}}


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
