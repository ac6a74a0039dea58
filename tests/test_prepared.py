"""Round-8-prepared operators, held to the driver-identical comparison
contract NOW (see flink_cookbook_spark/pipeline/prepared.py for why
their register() calls are deferred one round)."""

from __future__ import annotations

import pytest

from flink_cookbook_spark.pipeline.prepared import PREPARED_R8
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(PREPARED_R8))
def test_prepared_matches_oracle(name, spark, sf_dir, con):
    fn, oracle = PREPARED_R8[name]
    df = fn(spark, sf_dir)
    problems = compare(df, con, oracle, name)
    assert not problems, "\n".join(problems)
    # the vacuous-green lint, applied early: a prepared query must have
    # a non-empty answer at the fixture SF or it cannot register
    assert df.count() > 0, f"{name}: empty at fixture SF — vacuous oracle"


def test_asof_tolerance_actually_filters(spark, sf_dir):
    """The tolerance must do work on the fixture: some purchases have a
    fresh view (non-null), some have only a stale or missing one."""
    from flink_cookbook_spark.pipeline.prepared import asof_tolerance_join

    rows = asof_tolerance_join(spark, sf_dir).collect()
    fresh = sum(1 for r in rows if r.fresh)
    assert 0 < fresh < len(rows), (fresh, len(rows))
    for r in rows:
        if r.fresh:
            assert r.view_t_fresh is not None and r.t - r.view_t_fresh <= 3600
        else:
            assert r.view_t_fresh is None and r.view_value_fresh is None


def test_split_is_total_and_stratified(spark, sf_dir):
    """Every document lands in exactly one split, and per-stratum shares
    sum to 1 with the train split dominating."""
    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline.prepared import stratified_split_manifest

    rows = stratified_split_manifest(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    assert n_total == load(spark, sf_dir, "documents").count()
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault((r.lang, r.source), []).append(r)
    for rs in by_stratum.values():
        assert abs(sum(x.stratum_share for x in rs) - 1.0) < 1e-3
        splits = {x.split: x.n_docs for x in rs}
        # dominance is an EXPECTATION (80/10/10 via a fair coin): tiny
        # strata can legitimately land val-heavy, so only assert where
        # the sample is big enough for the margin to be overwhelming
        if sum(splits.values()) >= 50:
            assert splits.get("train", 0) >= splits.get("val", 0)
            assert splits.get("train", 0) >= splits.get("test", 0)
    # global shares must track 80/10/10
    totals: dict = {}
    for r in rows:
        totals[r.split] = totals.get(r.split, 0) + r.n_docs
    assert abs(totals.get("train", 0) / n_total - 0.8) < 0.1


def test_pq_code_compresses_and_reconstructs(spark, sf_dir):
    """PQ codes must live in the trained code space and the
    reconstruction error must be finite and nonzero (lossy by nature)."""
    from flink_cookbook_spark.pipeline.prepared import pq_reconstruction_manifest

    rows = pq_reconstruction_manifest(spark, sf_dir).collect()
    assert rows
    assert all(r.ca >= 0 and r.cb >= 0 for r in rows)
    assert all(r.mse >= 0 for r in rows)
    assert any(r.mse > 0 for r in rows)


def test_prepared_names_do_not_collide_with_registry():
    """A prepared name colliding with a registered query would make the
    round-8 activation a duplicate-registration error; also hold
    prepared oracles to the HUGEINT lint early (same DESCRIBE check the
    registry enforces)."""
    import duckdb

    from flink_cookbook_spark.registry import all_specs
    from tests.conftest import SF_DIR

    registered = set(all_specs())
    clashes = registered & set(PREPARED_R8)
    assert not clashes, clashes
    con = duckdb_connection(SF_DIR)
    offenders = []
    for name, (_, oracle) in sorted(PREPARED_R8.items()):
        for col, typ, *_ in con.execute("DESCRIBE " + oracle).fetchall():
            if "HUGEINT" in typ.upper():
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, offenders


def test_funnel_always_emits_every_stage(spark, sf_dir):
    """All four stages must emit (zero drops included — the
    similarity_threshold_curve lesson), survivors must be monotonically
    non-increasing, and the final survivor count must equal the keeps."""
    from flink_cookbook_spark.pipeline.prepared import (
        FUNNEL_STAGES, filter_funnel_report,
    )
    from flink_cookbook_spark.pipeline.text import corpus_filter_pipeline

    rows = sorted(filter_funnel_report(spark, sf_dir).collect(),
                  key=lambda r: r.stage)
    assert [(r.stage, r.reason) for r in rows] == list(FUNNEL_STAGES)
    remaining = [r.n_remaining for r in rows]
    assert remaining == sorted(remaining, reverse=True)
    keeps = corpus_filter_pipeline(spark, sf_dir).where("keep").count()
    assert remaining[-1] == keeps


def test_temperature_flattens_the_mix(spark, sf_dir):
    """alpha < 1 must flatten: scaled shares sum to 1 and the boost is
    strictly decreasing in raw share (small sources get boosted up,
    big sources damped down)."""
    from flink_cookbook_spark.pipeline.prepared import temperature_mixture_weights

    rows = temperature_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-3
    by_share = sorted(rows, key=lambda r: r.raw_share)
    boosts = [r.boost for r in by_share]
    assert boosts == sorted(boosts, reverse=True)


def test_contrastive_pairs_are_valid(spark, sf_dir):
    """Partners must differ from the anchor, cosines must be bounded,
    and the sampled corpus must yield at least one hard positive and
    hard negatives for every anchor (labels are diverse)."""
    from flink_cookbook_spark.pipeline.prepared import contrastive_pair_mining

    rows = contrastive_pair_mining(spark, sf_dir).collect()
    assert rows
    assert all(r.hard_neg_id is not None for r in rows)
    assert any(r.hard_pos_id is not None for r in rows)
    for r in rows:
        for pid, pcos in ((r.hard_pos_id, r.hard_pos_cos),
                          (r.hard_neg_id, r.hard_neg_cos)):
            if pid is not None:
                assert pid != r.vec_id
                assert -1.000001 <= pcos <= 1.000001


def test_rate_profile_moment_ordering(spark, sf_dir):
    """mean <= p95 <= peak and the peak-to-mean ratio >= 1 per type."""
    from flink_cookbook_spark.pipeline.prepared import event_rate_profile

    rows = event_rate_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mean_per_min <= r.p95_per_min + 1e-6
        assert r.p95_per_min <= r.peak_per_min + 1e-6
        assert r.peak_to_mean >= 1.0 - 1e-6
        assert r.n_events >= r.n_minutes


def test_zipf_head_is_decreasing(spark, sf_dir):
    """Frequency is non-increasing in rank, so the fitted slope must be
    <= 0; r2 bounded; the head never exceeds ZIPF_TOP_N ranks."""
    from flink_cookbook_spark.pipeline.prepared import ZIPF_TOP_N, zipf_fit

    rows = zipf_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope <= 1e-6
        assert -1e-6 <= r.fit_r2 <= 1.0 + 1e-6
        assert 0 < r.top_token_share < 1
        assert 0 < r.n_ranks <= ZIPF_TOP_N
        assert r.vocab_size >= r.n_ranks


def test_new_prepared_survive_empty_tables(spark, tmp_path):
    """Zero-row inputs must not crash the round-8-prepared operators;
    the funnel keeps its always-emit contract (4 stage rows, all zero)
    even on an empty corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_cookbook_spark.pipeline._cache import clear
    from flink_cookbook_spark.pipeline.prepared import (
        PREPARED_R8, filter_funnel_report,
    )

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    clear()
    for name in (
        "temperature_mixture_weights",
        "contrastive_pair_mining",
        "event_rate_profile",
        "zipf_fit",
    ):
        fn, _ = PREPARED_R8[name]
        assert fn(spark, str(tmp_path)).count() == 0, name
    rows = filter_funnel_report(spark, str(tmp_path)).collect()
    assert len(rows) == 4
    assert all(r.n_dropped == 0 and r.n_remaining == 0 for r in rows)
    clear()


def test_watermark_sweep_is_monotone(spark, sf_dir):
    """Every candidate delay must emit; drops must be non-increasing and
    completeness non-decreasing in the delay; delay 0 must drop exactly
    the out-of-order events (lateness > 0)."""
    from flink_cookbook_spark.pipeline.prepared import (
        WATERMARK_CANDIDATES, watermark_completeness_sweep,
    )

    rows = sorted(watermark_completeness_sweep(spark, sf_dir).collect(),
                  key=lambda r: r.watermark_delay_s)
    assert [r.watermark_delay_s for r in rows] == list(WATERMARK_CANDIDATES)
    drops = [r.n_dropped for r in rows]
    assert drops == sorted(drops, reverse=True)
    comps = [r.completeness for r in rows]
    assert comps == sorted(comps)
    assert all(0.0 <= c <= 1.0 + 1e-6 for c in comps)


def test_class_balance_shares_and_effective_classes(spark, sf_dir):
    """Shares sum to 1, the majority class has vs_majority == 1, and the
    effective class count lies in [1, n_labels]."""
    from flink_cookbook_spark.pipeline.prepared import class_balance_report

    rows = class_balance_report(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    assert any(abs(r.vs_majority - 1.0) < 1e-5 for r in rows)
    eff = {r.effective_classes for r in rows}
    assert len(eff) == 1  # window-computed constant, same on every row
    assert 1.0 - 1e-6 <= eff.pop() <= len(rows) + 1e-6


def test_kaplan_meier_curve_shape(spark, sf_dir):
    """Survival starts at 1 - d1/n1, is strictly within (0, 1], and is
    non-increasing; risk sets shrink as t grows."""
    from flink_cookbook_spark.pipeline.prepared import kaplan_meier_survival

    rows = sorted(kaplan_meier_survival(spark, sf_dir).collect(),
                  key=lambda r: r.t_hours)
    assert rows
    first = rows[0]
    assert abs(first.survival - (1.0 - first.n_events / first.n_at_risk)) < 1e-4
    surv = [r.survival for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in surv)
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert all(r.n_events <= r.n_at_risk for r in rows)


def test_gini_bounds_and_top_decile(spark, sf_dir):
    """Gini lies in [0, 1); the top decile's share is at least its
    population share (the decile holds the largest revenues)."""
    from flink_cookbook_spark.pipeline.prepared import revenue_concentration_gini

    rows = revenue_concentration_gini(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        ntop = (r.n_customers + 9) // 10
        assert r.top_decile_share >= ntop / r.n_customers - 1e-6
        assert r.top_decile_share <= 1.0 + 1e-6


def test_periodogram_one_dominant_per_type(spark, sf_dir):
    """Each event type gets all candidate periods, power in [0, 1], and
    at least one dominant row (ties can mark several, rounded compare)."""
    from flink_cookbook_spark.pipeline.prepared import (
        PERIODOGRAM_PERIODS, periodogram_peaks,
    )

    rows = periodogram_peaks(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert sorted(x.period_minutes for x in rs) == sorted(PERIODOGRAM_PERIODS)
        assert all(0.0 <= x.power_norm <= 1.0 + 1e-6 for x in rs)
        doms = [x for x in rs if x.is_dominant]
        assert doms, t
        top = max(x.power_norm for x in rs)
        assert all(x.power_norm == top for x in doms)


def test_changepoint_gain_is_the_max(spark, sf_dir):
    """The reported split must achieve the maximal gain over a manual
    recompute of every candidate split from the daily series."""
    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline.prepared import best_split_changepoint
    from pyspark.sql import functions as F

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 86400).alias("day"),
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cnt))
    best = {}
    for t, pts in series.items():
        pts.sort()
        cnts = [c for _, c in pts]
        n, tot = len(cnts), sum(cnts)
        gains = []
        run = 0
        for k in range(1, n):
            run += cnts[k - 1]
            m1, m2 = run / k, (tot - run) / (n - k)
            gains.append(k * (n - k) / n * (m1 - m2) ** 2)
        best[t] = max(gains)
    for r in best_split_changepoint(spark, sf_dir).collect():
        assert r.sse_reduction >= 0.0
        assert r.n_days_before >= 1 and r.n_days_after >= 1
        assert abs(r.sse_reduction - best[r.event_type]) < 1e-3


def test_knn_consistency_bounds(spark, sf_dir):
    """Per-label consistency lies in [0, 1] and the per-label vector
    counts sum to the capped sample size."""
    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline.prepared import (
        KNN_MAX_VECTORS, knn_label_consistency,
    )

    rows = knn_label_consistency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.min_consistency <= r.mean_consistency <= 1.0
    n = load(spark, sf_dir, "embeddings").count()
    mod = max(1, n // KNN_MAX_VECTORS)
    assert sum(r.n_vectors for r in rows) <= max(n, 2 * KNN_MAX_VECTORS)
    assert len({r.label for r in rows}) == len(rows)
