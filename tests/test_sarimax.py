"""Property tests for the stateful baseline model operator (SURVEY.md
section 5.2: rows-only driver check, so numerical properties live here)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flink_cookbook_spark.streaming.sarimax import (
    FIXTURE_CONFIG,
    BaselineConfig,
    _KeyState,
    _process_sample,
    baseline_batch,
    forecast_next,
)


def test_forecast_constant_series_is_constant():
    cfg = BaselineConfig(season=12)
    z = np.full(40, 7.5)
    assert forecast_next(z, cfg) == pytest.approx(7.5)


def test_forecast_pure_seasonal_pattern():
    """A strict periodic signal forecasts the value one season ahead."""
    cfg = BaselineConfig(season=4)
    pattern = [1.0, 5.0, 9.0, 3.0]
    z = np.array(pattern * 8)
    fc = forecast_next(z, cfg)
    assert fc == pytest.approx(pattern[len(z) % 4], abs=1e-9)


def test_forecast_short_history_is_naive():
    cfg = BaselineConfig(season=12)
    assert forecast_next(np.array([3.0, 4.0]), cfg) == 4.0


def test_welford_matches_numpy():
    """State-loop moments must match numpy mean/std to 1e-9 (SURVEY.md
    section 5.2 property)."""
    rng = np.random.default_rng(7)
    xs = rng.normal(50, 10, size=500)
    st = _KeyState()
    cfg = BaselineConfig(max_history=10_000, min_history=10_000)  # never emit
    for x in xs:
        _process_sample(st, float(x), cfg)
    assert st.mean == pytest.approx(np.mean(xs), abs=1e-9)
    assert st.std() == pytest.approx(np.std(xs, ddof=1), abs=1e-9)


def test_history_trim_bounds_state():
    cfg = BaselineConfig(max_history=50, min_history=10, emit_every_n=5, season=5)
    st = _KeyState()
    for x in range(500):
        _process_sample(st, float(x), cfg)
    assert len(st.scaled) == 50
    assert len(st.raw) == 50
    assert st.count == 500  # Welford counts everything; history is bounded


def test_emit_cadence():
    """Emissions occur exactly on every Nth sample once min_history is
    reached (flinkarima.py:218-224 semantics)."""
    cfg = BaselineConfig(max_history=100, min_history=10, emit_every_n=5, season=3)
    st = _KeyState()
    emitted_at = []
    for i in range(1, 101):
        rec = _process_sample(st, float(i % 7), cfg)
        if rec is not None:
            emitted_at.append(i)
    assert emitted_at == [i for i in range(1, 101) if i % 5 == 0 and i >= 10]


def test_baseline_within_sane_range():
    """On a stationary series the inverse-scaled baseline must stay in
    the data's neighborhood and never below 0 (clamp, flinkarima.py:248)."""
    cfg = BaselineConfig(max_history=100, min_history=12, emit_every_n=5, season=12)
    st = _KeyState()
    rng = np.random.default_rng(3)
    recs = []
    for x in rng.normal(40, 5, size=200):
        rec = _process_sample(st, float(max(0, x)), cfg)
        if rec:
            recs.append(rec)
    assert recs
    for r in recs:
        assert 0 <= r["baseline"] <= 100
        assert r["running_std"] > 0


def test_batch_twin_equals_plain_python(spark, sf_dir):
    """applyInPandas over real fixture data must equal a plain-Python
    replay of the same per-key series — proves the distributed grouping /
    ordering adds nothing."""
    from flink_cookbook_spark.operators.metrics import _windowed

    win = _windowed(spark, sf_dir).collect()
    got = {
        (r.user_id, r.window_start): r.baseline
        for r in baseline_batch(_windowed(spark, sf_dir), FIXTURE_CONFIG).collect()
    }
    # plain python replay
    series: dict[int, list] = {}
    for r in sorted(win, key=lambda r: (r.user_id, r.window_start)):
        series.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, rows in series.items():
        st = _KeyState()
        for r in rows:
            rec = _process_sample(st, float(r.avg_value), FIXTURE_CONFIG)
            if rec is not None:
                want[(uid, r.window_start)] = rec["baseline"]
    assert set(got) == set(want)
    assert got and all(got[k] == pytest.approx(want[k], abs=1e-9) for k in want)
