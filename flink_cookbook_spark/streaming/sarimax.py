"""The stateful time-series baseline operator (reference A1-A8).

The reference keeps per-key state (scaled + raw history, Welford
count/mean/M2, emit counter) and on every Nth window sample fits
SARIMAX(1,1,1)x(0,1,1,s) on the scaled history, forecasts one step,
inverse-scales, and emits a 9-field baseline record
(/root/reference/src/flinkarima.py:171-256; contract README.md:113-126).

Spark-first design (SURVEY.md section 4.2): the model is the one operator
Catalyst cannot express, so it lives behind a pandas-UDF boundary —
``applyInPandas`` per key in batch (each group processed as one ordered
pandas frame), ``applyInPandasWithState`` in streaming (Arrow-batched
state, vs the reference's per-record pickling). Everything around it
(window agg, enrichment join, alert filter) stays relational.

Three forecasters behind one switch (``BaselineConfig.method``): the
exact statsmodels SARIMAX (used automatically when importable), a
VENDORED CSS fit of the same ARIMA(1,1,1)x(0,1,1,s) model
(streaming/seasonal_arima.py — no statsmodels needed, pytest-verified
against simulated data and, env-gated, against statsmodels itself), and
a closed-form numpy fallback (seasonal-naive level + EWMA of the
seasonally differenced series ~ SARIMA(0,0,0)(0,1,1)s) whose math is
hash-checked end-to-end by ``baseline_fallback_oracle``. ``auto``
resolves statsmodels -> fallback, keeping the registered fixture
queries on the fast closed-form path.

State-update order replicated exactly (flinkarima.py:191-239):
scale with PRE-update mean/std -> append + trim history -> Welford update
-> emit-cadence check -> fit/forecast -> inverse-scale with POST-update
mean/std -> clamp >= 0 -> trend metrics from raw history.

Scale notes (100 TB): state per key is <= 2*max_history doubles + 4
scalars (~23 KB at the reference's 1440) — far under state-store limits;
keys hash-partition across executors, Arrow moves whole key-batches, and
the emit cadence bounds model-fit cost to 1 fit per key per N windows.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.registry import register, rnd

try:  # pragma: no cover - not installed in this container
    from statsmodels.tsa.statespace.sarimax import SARIMAX  # type: ignore

    HAVE_STATSMODELS = True
except ImportError:
    HAVE_STATSMODELS = False


@dataclass(frozen=True)
class BaselineConfig:
    """Reference defaults from run_job.sh:11-28 / flinkarima.py:498-515,
    scaled down for the fixture cadence by the registered queries.

    ``method`` selects the forecaster:
    - ``"auto"``: statsmodels SARIMAX when importable, else the EWMA
      fallback (the fast closed-form path the registered fixture
      queries use — its math is hash-checked end-to-end by
      ``baseline_fallback_oracle``).
    - ``"sarimax"``: force the exact statsmodels fit (raises if absent).
    - ``"css"``: the vendored seasonal-ARIMA(1,1,1)x(0,1,1,s) CSS fit
      (streaming/seasonal_arima.py) — the reference MODEL without the
      statsmodels dependency; per-fit cost is a real optimizer run, so
      use it at the reference's fit cadence, not in bulk bench paths.
    - ``"ewma"``: force the closed-form fallback.
    """

    max_history: int = 1440
    min_history: int = 288
    emit_every_n: int = 5
    season: int = 288
    order: tuple[int, int, int] = (1, 1, 1)
    seasonal_order: tuple[int, int, int] = (0, 1, 1)
    forecast_steps: int = 1
    method: str = "auto"


#: fixture-scale config: 5-min windows over ~2 weeks of events, 12
#: samples = one 'season' (hour); reference ratios preserved.
FIXTURE_CONFIG = BaselineConfig(max_history=96, min_history=12, emit_every_n=5, season=12)

BASELINE_SCHEMA = (
    "user_id long, window_start long, observed double, baseline double, "
    "history_size int, running_mean double, running_std double, "
    "trend_latest double, trend_5season double, model string"
)

def resolve_method(cfg: BaselineConfig) -> str:
    """Concrete forecaster for a config: auto -> sarimax|ewma."""
    if cfg.method == "auto":
        return "sarimax" if HAVE_STATSMODELS else "ewma"
    return cfg.method


def model_name(cfg: BaselineConfig) -> str:
    """Per-record ``model`` tag so consumers can tell which forecaster
    produced a baseline (exact statsmodels fit, vendored CSS fit of the
    same model, or the closed-form fallback)."""
    return {"sarimax": "sarimax", "css": "sarimax_css", "ewma": "ewma_fallback"}[
        resolve_method(cfg)
    ]


def forecast_next(history: np.ndarray, cfg: BaselineConfig) -> float:
    """One-step forecast of the scaled series.

    sarimax: the reference's exact statsmodels fit (flinkarima.py:226-235).
    css: the vendored CSS fit of the SAME ARIMA(1,1,1)x(0,1,1,s) model
    (streaming/seasonal_arima.py) — no statsmodels required.
    ewma: seasonal-naive + EWMA of the seasonally differenced series —
    EWMA(alpha) is the closed form of the (0,1,1) MA-smoothing the
    reference's seasonal component applies.
    """
    z = np.asarray(history, dtype=np.float64)
    method = resolve_method(cfg)
    if method == "sarimax":  # pragma: no cover - statsmodels absent here
        model = SARIMAX(
            z,
            order=cfg.order,
            seasonal_order=(*cfg.seasonal_order, cfg.season),
            enforce_stationarity=False,
            enforce_invertibility=False,
        )
        fitted = model.fit(disp=False)
        return float(fitted.forecast(cfg.forecast_steps)[-1])
    if method == "css":
        from flink_cookbook_spark.streaming.seasonal_arima import forecast_one_step

        return forecast_one_step(z, cfg.season)
    if method != "ewma":
        raise ValueError(f"unknown forecast method {cfg.method!r}")
    s = cfg.season
    if len(z) < s + 1:
        return float(z[-1]) if len(z) else 0.0
    diffs = z[s:] - z[:-s]
    alpha = 0.3
    level = diffs[0]
    for d in diffs[1:]:
        level = alpha * d + (1 - alpha) * level
    return float(z[len(z) - s] + level)


def _trend_metrics(
    raw: list[float], cfg: BaselineConfig
) -> tuple[float | None, float | None]:
    """Exact twin of _daily_trend_metrics (flinkarima.py:130-142,
    call site :240-244): the reference passes days = max(5, max_history
    // season), trims to the last days*season samples, then averages the
    last season (trend_latest) and the WHOLE trimmed slice
    (trend_5season — the reference keeps the 'five_day_avg' name even
    when days > 5, as at this repo's fixture ratio 96//12 = 8)."""
    if not raw:
        return None, None
    season = max(1, cfg.season)
    days = max(5, cfg.max_history // season)
    trimmed = raw[-season * days :]
    latest = trimmed[-season:] if len(trimmed) >= season else trimmed
    return (
        float(sum(latest) / len(latest)),
        float(sum(trimmed) / len(trimmed)),
    )


class _KeyState:
    """Per-key mutable state, mirroring the reference's Flink state cells
    (flinkarima.py:171-189)."""

    __slots__ = ("count", "mean", "m2", "counter", "scaled", "raw")

    def __init__(self, count=0, mean=0.0, m2=0.0, counter=0, scaled=None, raw=None):
        self.count = count
        self.mean = mean
        self.m2 = m2
        self.counter = counter
        self.scaled = list(scaled) if scaled else []
        self.raw = list(raw) if raw else []

    def std(self) -> float:
        if self.count > 1:
            return math.sqrt(self.m2 / (self.count - 1))
        return 0.0


def _process_sample(
    state: _KeyState, x: float, cfg: BaselineConfig
) -> dict | None:
    """One reference process_element step; returns a baseline record when
    the emit cadence fires, else None."""
    # 1. scale with PRE-update moments (flinkarima.py:194-199)
    pre_std = state.std()
    scaled = (x - state.mean) / pre_std if pre_std > 0 else 0.0
    # 2. append + trim (flinkarima.py:199-206)
    state.scaled.append(scaled)
    state.raw.append(x)
    if len(state.scaled) > cfg.max_history:
        state.scaled = state.scaled[-cfg.max_history :]
        state.raw = state.raw[-cfg.max_history :]
    # 3. Welford update (flinkarima.py:208-216)
    state.count += 1
    delta = x - state.mean
    state.mean += delta / state.count
    state.m2 += delta * (x - state.mean)
    # 4. emit cadence (flinkarima.py:218-224)
    state.counter = (state.counter + 1) % cfg.emit_every_n
    if state.counter != 0 or len(state.scaled) < cfg.min_history:
        return None
    # 5. fit + forecast on scaled history (flinkarima.py:226-235)
    try:
        scaled_fc = forecast_next(np.array(state.scaled), cfg)
    except Exception:
        return None  # reference logs & swallows per key
    # 6. inverse scale with POST-update moments, clamp (flinkarima.py:236-248)
    post_std = state.std()
    baseline = scaled_fc * post_std + state.mean if post_std > 0 else state.mean
    baseline = max(0.0, baseline)
    trend_latest, trend_5 = _trend_metrics(state.raw, cfg)
    return {
        "observed": x,
        "baseline": baseline,
        "history_size": len(state.scaled),
        "running_mean": state.mean,
        "running_std": post_std,
        "trend_latest": trend_latest,
        "trend_5season": trend_5,
        "model": model_name(cfg),
    }


def _ewma_vectorized_runner(cfg: BaselineConfig, cols: list[str]):
    """mapInPandas runner for the EWMA forecaster that replays the state
    loop vectorized ACROSS KEYS: instead of one Python `_process_sample`
    call per row, a step loop advances every key's state one sample at a
    time with NumPy elementwise ops (guide section 4.2 — hand whole
    batches to vectorized native code).

    Bit-identity argument: per key, the SEQUENCE of floating-point
    operations is exactly `_process_sample`'s — same pre-update scaling,
    same append-then-trim buffer, same Welford update order (delta
    against the pre-update mean, m2 against the post-update mean), same
    left-fold EWMA over the seasonal diffs, same left-to-right trend
    sums — only executed for all keys of a step in one ufunc call each.
    NumPy float64 ufuncs are IEEE-754 doubles like Python floats, so per
    key every intermediate is the same bits. Pinned by
    tests/test_sarimax.py::test_vectorized_runner_equals_scalar_loop.

    Emit-row forecasts group keys by history LENGTH (keys whose buffers
    grew together share a length), so the per-emit fold/trend loops are
    O(history) NumPy vector ops per group, not per key. The scalar
    runner remains the css/statsmodels path (a real optimizer fit per
    emit cannot vectorize) and the reference for the equality pin.
    """
    H, N, MIN, s = cfg.max_history, cfg.emit_every_n, cfg.min_history, cfg.season
    season = max(1, s)
    trim_len = season * max(5, H // season)
    alpha = FALLBACK_ALPHA
    mname = model_name(cfg)

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # uid -> (count, mean, m2, counter, histlen, scaled_row, raw_row)
        carry: dict[int, tuple] = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            uids = pdf["user_id"].to_numpy()
            vals = pdf["avg_value"].to_numpy(dtype=np.float64)
            wss = pdf["window_start"].to_numpy()
            # contiguous per-key segments (input sorted by user_id, ts)
            cut = np.flatnonzero(uids[1:] != uids[:-1]) + 1
            starts = np.concatenate(([0], cut))
            seglen = np.diff(np.concatenate((starts, [n])))
            keys = uids[starts]
            m = len(keys)
            count = np.zeros(m, np.int64)
            mean = np.zeros(m, np.float64)
            m2 = np.zeros(m, np.float64)
            counter = np.zeros(m, np.int64)
            histlen = np.zeros(m, np.int64)
            hist_s = np.zeros((m, H), np.float64)
            hist_r = np.zeros((m, H), np.float64)
            for j, uid in enumerate(keys):
                st = carry.get(int(uid))
                if st is not None:
                    count[j], mean[j], m2[j], counter[j], histlen[j] = st[:5]
                    hist_s[j] = st[5]
                    hist_r[j] = st[6]
            out: list[tuple] = []  # (seg_idx, t, record)
            for t in range(int(seglen.max())):
                act = np.flatnonzero(seglen > t)
                x = vals[starts[act] + t]
                na = len(act)
                # 1. scale with PRE-update moments
                pre_std = np.zeros(na)
                sel = count[act] > 1
                if sel.any():
                    ai = act[sel]
                    pre_std[sel] = np.sqrt(m2[ai] / (count[ai] - 1))
                scaled = np.zeros(na)
                sel = pre_std > 0
                if sel.any():
                    scaled[sel] = (x[sel] - mean[act[sel]]) / pre_std[sel]
                # 2. append + trim (shift-left when the buffer is full)
                full = histlen[act] == H
                if full.any():
                    af = act[full]
                    hist_s[af, :-1] = hist_s[af, 1:]
                    hist_s[af, -1] = scaled[full]
                    hist_r[af, :-1] = hist_r[af, 1:]
                    hist_r[af, -1] = x[full]
                nf = ~full
                if nf.any():
                    anf = act[nf]
                    hist_s[anf, histlen[anf]] = scaled[nf]
                    hist_r[anf, histlen[anf]] = x[nf]
                    histlen[anf] += 1
                # 3. Welford update (delta vs pre-mean, m2 vs post-mean)
                count[act] += 1
                delta = x - mean[act]
                mean[act] = mean[act] + delta / count[act]
                m2[act] = m2[act] + delta * (x - mean[act])
                # 4. emit cadence
                counter[act] = (counter[act] + 1) % N
                em = (counter[act] == 0) & (histlen[act] >= MIN)
                if not em.any():
                    continue
                ex = x[em]
                eact = act[em]
                post_std = np.zeros(len(eact))
                psel = count[eact] > 1
                if psel.any():
                    pi = eact[psel]
                    post_std[psel] = np.sqrt(m2[pi] / (count[pi] - 1))
                # 5+6. forecast + inverse-scale, per history-length group
                fc = np.empty(len(eact), np.float64)
                tr_latest = np.empty(len(eact), np.float64)
                tr_5 = np.empty(len(eact), np.float64)
                for L in np.unique(histlen[eact]):
                    g = np.flatnonzero(histlen[eact] == L)
                    Z = hist_s[eact[g], :L]
                    if L < s + 1:
                        fc[g] = Z[:, L - 1]
                    else:
                        diffs = Z[:, s:] - Z[:, :-s]
                        level = diffs[:, 0].copy()
                        for d in range(1, L - s):
                            level = alpha * diffs[:, d] + (1 - alpha) * level
                        fc[g] = Z[:, L - s] + level
                    R = hist_r[eact[g], :L]
                    eff = int(min(trim_len, L))
                    acc = R[:, L - eff].copy()
                    for i in range(1, eff):
                        acc = acc + R[:, L - eff + i]
                    tr_5[g] = acc / eff
                    lat = season if eff >= season else eff
                    acc = R[:, L - lat].copy()
                    for i in range(1, lat):
                        acc = acc + R[:, L - lat + i]
                    tr_latest[g] = acc / lat
                baseline = np.where(
                    post_std > 0, fc * post_std + mean[eact], mean[eact]
                )
                baseline = np.maximum(0.0, baseline)
                for i, j in enumerate(eact):
                    out.append(
                        (
                            int(j),
                            t,
                            {
                                "user_id": int(keys[j]),
                                "window_start": int(wss[starts[j] + t]),
                                "observed": float(ex[i]),
                                "baseline": float(baseline[i]),
                                "history_size": int(histlen[j]),
                                "running_mean": float(mean[j]),
                                "running_std": float(post_std[i]),
                                "trend_latest": float(tr_latest[i]),
                                "trend_5season": float(tr_5[i]),
                                "model": mname,
                            },
                        )
                    )
            for j, uid in enumerate(keys):
                carry[int(uid)] = (
                    count[j], mean[j], m2[j], counter[j], histlen[j],
                    hist_s[j].copy(), hist_r[j].copy(),
                )
            if out:
                # scalar-runner row order: per key segment, then per step
                out.sort(key=lambda r: (r[0], r[1]))
                yield pd.DataFrame([r[2] for r in out], columns=cols)

    return run_partition


def baseline_batch(
    windowed: DataFrame,
    cfg: BaselineConfig = FIXTURE_CONFIG,
    *,
    input_copartitioned: bool = False,
) -> DataFrame:
    """Batch twin: replay each key's ordered window series through the
    exact state loop.

    Physical shape: hash-repartition on the key, sort within partitions
    by (key, window_start) — both JVM-side — then ONE mapInPandas pass
    whose per-key state dict survives Arrow-batch boundaries. Compared
    to applyInPandas-per-group this amortizes the Python/pandas overhead
    across whole record batches (thousands of tiny keys per batch, the
    100 TB cardinality shape) while computing the identical sequence of
    per-sample operations.

    ``input_copartitioned=True`` skips the repartition: callers feeding
    the memoized windowed aggregate (already materialized hash-
    partitioned by user_id) declare that every key's rows are already
    physically in one partition, eliding a redundant full exchange of
    the series. The correctness contract is physical layout, not what
    Catalyst knows — AQE partition coalescing merges whole partitions,
    so the co-location survives it. Only pass True when the input
    demonstrably clusters keys (the memo, or a filter/projection of it);
    a mis-declared input would split a key's state across partitions."""

    cols = [
        "user_id", "window_start", "observed", "baseline", "history_size",
        "running_mean", "running_std", "trend_latest", "trend_5season", "model",
    ]

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[int, _KeyState] = {}
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                st = states.setdefault(row.user_id, _KeyState())
                rec = _process_sample(st, float(row.avg_value), cfg)
                if rec is not None:
                    rec["user_id"] = int(row.user_id)
                    rec["window_start"] = int(row.window_start)
                    out.append(rec)
            if out:
                yield pd.DataFrame(out, columns=cols)

    # the closed-form EWMA forecaster needs no per-emit optimizer run, so
    # its replay vectorizes across keys (bit-identical — see the runner's
    # docstring); css/statsmodels fits stay on the scalar reference loop
    if resolve_method(cfg) == "ewma":
        run_partition = _ewma_vectorized_runner(cfg, cols)

    clustered = windowed if input_copartitioned else windowed.repartition("user_id")
    return clustered.sortWithinPartitions("user_id", "window_start").mapInPandas(
        run_partition, schema=BASELINE_SCHEMA
    )


def baseline_streaming(
    windowed_stream: DataFrame, cfg: BaselineConfig = FIXTURE_CONFIG
) -> DataFrame:
    """Streaming form: applyInPandasWithState keeps (count, mean, m2,
    counter, scaled, raw) per key across micro-batches — co-partitioned
    on the key, so no broadcast is ever needed (SURVEY.md J1 note)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = (
        "count long, mean double, m2 double, counter int, "
        "scaled array<double>, raw array<double>"
    )

    def run(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            count, mean, m2, counter, scaled, raw = state.get
            ks = _KeyState(count, mean, m2, counter, scaled, raw)
        else:
            ks = _KeyState()
        out = []
        # a key's rows can span multiple Arrow chunks in shuffle order —
        # concatenate BEFORE sorting or samples process out of window order
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values("window_start")
            for row in whole.itertuples(index=False):
                rec = _process_sample(ks, float(row.avg_value), cfg)
                if rec is not None:
                    rec["user_id"] = int(user_id)
                    rec["window_start"] = int(row.window_start)
                    out.append(rec)
        state.update((ks.count, ks.mean, ks.m2, ks.counter, ks.scaled, ks.raw))
        cols = [
            "user_id", "window_start", "observed", "baseline", "history_size",
            "running_mean", "running_std", "trend_latest", "trend_5season", "model",
        ]
        yield pd.DataFrame(out, columns=cols)

    return windowed_stream.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=BASELINE_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def baseline_streaming_tws(
    windowed_stream: DataFrame, cfg: BaselineConfig = FIXTURE_CONFIG
) -> DataFrame:
    """Modern-API variant: the same operator on Spark 4's
    transformWithStateInPandas (StatefulProcessor + typed value state,
    RocksDB-backed — the state store one would run at 100 TB key
    cardinality). Semantics identical to baseline_streaming; equality is
    pinned in tests/test_streaming.py (skipped in containers lacking
    protobuf, which this API's state-server protocol requires)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    state_schema = T.StructType(
        [
            T.StructField("count", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
            T.StructField("counter", T.IntegerType()),
            T.StructField("scaled", T.ArrayType(T.DoubleType())),
            T.StructField("raw", T.ArrayType(T.DoubleType())),
        ]
    )
    cols = [
        "user_id", "window_start", "observed", "baseline", "history_size",
        "running_mean", "running_std", "trend_latest", "trend_5season", "model",
    ]

    class BaselineProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("baseline_state", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                count, mean, m2, counter, scaled, raw = self._state.get()
                ks = _KeyState(count, mean, m2, counter, list(scaled), list(raw))
            else:
                ks = _KeyState()
            (user_id,) = key
            out = []
            chunks = [pdf for pdf in rows]  # sort the WHOLE group, not per chunk
            if chunks:
                whole = pd.concat(chunks, ignore_index=True).sort_values("window_start")
                for row in whole.itertuples(index=False):
                    rec = _process_sample(ks, float(row.avg_value), cfg)
                    if rec is not None:
                        rec["user_id"] = int(user_id)
                        rec["window_start"] = int(row.window_start)
                        out.append(rec)
            self._state.update((ks.count, ks.mean, ks.m2, ks.counter, ks.scaled, ks.raw))
            if out:
                yield pd.DataFrame(out, columns=cols)

        def close(self) -> None:
            pass

    return windowed_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BaselineProcessor(),
        outputStructType=BASELINE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def sarimax_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A8 as a registered query: baseline records over the events
    window series (fixture-scale config). Rows-only check — the model is
    not SQL-expressible; numerical properties are pytest-verified
    (tests/test_sarimax.py)."""
    from flink_cookbook_spark.operators.metrics import _windowed

    # the memo is materialized hash-partitioned by user_id, so the
    # replay's repartition is redundant — declare the co-location
    return baseline_batch(
        _windowed(spark, sf_dir), FIXTURE_CONFIG, input_copartitioned=True
    )


register("sarimax_baseline", oracle=None, tags=("model", "A5", "A8", "stateful"))(
    sarimax_baseline
)


#: EWMA smoothing constant of the numpy fallback (forecast_next above).
FALLBACK_ALPHA = 0.3


def _fallback_scored(
    spark: SparkSession, sf_dir: str, all_rows: bool = False
) -> DataFrame:
    """The relational EWMA-fallback baseline chain over the windowed
    series, up to the one-step forecast ``fc`` (see
    ``baseline_fallback_oracle`` for the stage-by-stage mapping).

    ``all_rows=False`` (the registered baseline query's shape) filters to
    the emit-cadence rows before the forecast fold. ``all_rows=True``
    keeps EVERY window row, adds an ``_emit`` flag, and guards the
    forecast expressions behind it (CASE WHEN short-circuits, so
    non-emit rows never evaluate the fold) — the shape the end-to-end
    alert pipeline sweeps directly, without unioning a second scan of
    the memo back in. Emit-row values are identical between the two
    forms: same window frames, same expressions, only the filter moves.
    """
    from flink_cookbook_spark.operators.metrics import _windowed

    cfg = FIXTURE_CONFIG
    w = Window.partitionBy("user_id").orderBy("window_start")
    rows_pre = w.rowsBetween(Window.unboundedPreceding, -1)
    rows_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows_hist = w.rowsBetween(-(cfg.max_history - 1), Window.currentRow)
    rows_season = w.rowsBetween(-(cfg.season - 1), Window.currentRow)
    s, a = cfg.season, FALLBACK_ALPHA

    scored = (
        _windowed(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("pre_mean", F.avg("avg_value").over(rows_pre))
        .withColumn("pre_std", F.stddev_samp("avg_value").over(rows_pre))
        .withColumn("post_mean", F.avg("avg_value").over(rows_all))
        .withColumn("post_std", F.stddev_samp("avg_value").over(rows_all))
        .withColumn("trend_latest_u", F.avg("avg_value").over(rows_season))
        .withColumn("trend_5season_u", F.avg("avg_value").over(rows_hist))
        .withColumn(
            "z",
            F.when(
                F.col("pre_std") > 0,
                (F.col("avg_value") - F.col("pre_mean")) / F.col("pre_std"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("zhist", F.collect_list("z").over(rows_hist))
    )
    emit_cond = (F.col("rn") % cfg.emit_every_n == 0) & (
        F.least(F.col("rn"), F.lit(cfg.max_history)) >= cfg.min_history
    )
    if all_rows:
        scored = scored.withColumn("_emit", emit_cond)
        guard = lambda c: F.when(F.col("_emit"), c)  # noqa: E731
    else:
        scored = scored.where(emit_cond)
        guard = lambda c: c  # noqa: E731
    return scored.withColumn(
        "diffs",
        guard(
            F.expr(
                f"CASE WHEN size(zhist) > {s} THEN "
                f"transform(sequence(1, size(zhist) - {s}), "
                f"k -> element_at(zhist, k + {s}) - element_at(zhist, k)) "
                f"ELSE cast(array() AS array<double>) END"
            )
        ),
    ).withColumn(
        "fc",
        guard(
            F.expr(
                f"CASE WHEN size(zhist) < {s + 1} THEN element_at(zhist, size(zhist)) "
                f"ELSE element_at(zhist, size(zhist) - {s - 1}) + "
                f"aggregate(slice(diffs, 2, size(diffs) - 1), element_at(diffs, 1), "
                f"(acc, d) -> {a}D * d + {1.0 - a}D * acc) END"
            )
        ),
    )


def baseline_fallback_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A5+A6+A8 as a HASH-CHECKED query: the numpy-fallback baseline
    pipeline re-derived in pure relational algebra, so DuckDB can verify
    every step the stateful loop performs (flinkarima.py:191-248 order).

    The fallback forecast is closed-form: seasonal-naive level + EWMA of
    the seasonally differenced scaled history. Every piece of the
    per-sample state loop maps to a window expression over the per-key
    ordered series:

    - pre/post-update Welford mean/std  -> avg/stddev_samp over
      ``ROWS UNBOUNDED PRECEDING AND {1 PRECEDING | CURRENT ROW}``
    - bounded history buffer (A3)       -> ``collect_list`` over
      ``ROWS max_history-1 PRECEDING`` (exactly the trim semantics)
    - emit-every-N cadence (A4)         -> ``rn % N = 0`` filter
    - EWMA recurrence (A5 fallback)     -> ``aggregate`` fold over the
      seasonal diffs — the IDENTICAL left-fold the Python loop runs
      (DuckDB twin: ``list_reduce``)
    - inverse scale + clamp (A6)        -> post-moment affine + greatest
    - trend metrics (A7)                -> bounded-frame window avgs

    Physical shape: ONE shuffle (hash by user_id); every window function
    reuses that partitioning, the history frame is bounded at
    ``max_history`` elements, and the fold only runs on emit rows
    (filter precedes it). At 100 TB this is the bounded-state window
    replay shape — no Python, fully codegen'd except the array fold.

    Equivalence to the mapInPandas loop (``baseline_batch``) is pinned in
    tests/test_sarimax.py; this registered pair is the driver-facing
    proof that the fallback math itself is engine-exact.
    """
    emitted = _fallback_scored(spark, sf_dir)
    cfg = FIXTURE_CONFIG
    return emitted.select(
        "user_id",
        "window_start",
        F.col("avg_value").alias("observed"),
        rnd(
            F.greatest(
                F.lit(0.0),
                F.when(
                    F.col("post_std") > 0,
                    F.col("fc") * F.col("post_std") + F.col("post_mean"),
                ).otherwise(F.col("post_mean")),
            )
        ).alias("baseline"),
        F.least(F.col("rn"), F.lit(cfg.max_history)).cast("long").alias("history_size"),
        rnd("post_mean").alias("running_mean"),
        rnd(F.coalesce(F.col("post_std"), F.lit(0.0))).alias("running_std"),
        rnd("trend_latest_u").alias("trend_latest"),
        rnd("trend_5season_u").alias("trend_5season"),
        F.lit("ewma_fallback").alias("model"),
    )


def _fallback_ctes() -> str:
    """The WITH-chain shared by the fallback-baseline oracle and the
    end-to-end alert oracle: windowed series -> per-key moments ->
    scaled history -> emit rows -> EWMA forecast (``fcst``)."""
    from flink_cookbook_spark.operators.metrics import _WINDOWED_CTE

    cfg = FIXTURE_CONFIG
    s, a, h = cfg.season, FALLBACK_ALPHA, cfg.max_history
    return f"""
WITH {_WINDOWED_CTE.strip()},
seq AS (
  SELECT user_id, window_start, avg_value,
         row_number() OVER (PARTITION BY user_id ORDER BY window_start) AS rn,
         avg(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre_mean,
         stddev_samp(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre_std,
         avg(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS post_mean,
         stddev_samp(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS post_std,
         avg(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN {s - 1} PRECEDING AND CURRENT ROW) AS trend_latest_u,
         avg(avg_value) OVER (PARTITION BY user_id ORDER BY window_start
             ROWS BETWEEN {h - 1} PRECEDING AND CURRENT ROW) AS trend_5season_u
  FROM windowed
),
scaledcte AS (
  SELECT *, CASE WHEN pre_std > 0 THEN (avg_value - pre_mean) / pre_std
                 ELSE 0.0::DOUBLE END AS z
  FROM seq
),
hist AS (
  SELECT *, list(z) OVER (PARTITION BY user_id ORDER BY window_start
                ROWS BETWEEN {h - 1} PRECEDING AND CURRENT ROW) AS zhist
  FROM scaledcte
),
emitted AS (
  SELECT *,
    CASE WHEN len(zhist) > {s}
         THEN list_transform(range(1, len(zhist) - {s} + 1),
                             k -> zhist[k + {s}] - zhist[k])
         ELSE []::DOUBLE[] END AS diffs
  FROM hist
  WHERE rn % {cfg.emit_every_n} = 0 AND least(rn, {h}) >= {cfg.min_history}
),
fcst AS (
  SELECT *,
    CASE WHEN len(zhist) < {s + 1} THEN zhist[len(zhist)]
         ELSE zhist[len(zhist) - {s - 1}] +
              list_reduce(diffs, (acc, d) -> {a}::DOUBLE * d + {1.0 - a}::DOUBLE * acc)
    END AS fc
  FROM emitted
)"""


def _fallback_oracle_sql() -> str:
    from flink_cookbook_spark.registry import NUDGE, ROUND_DP

    cfg = FIXTURE_CONFIG
    h = cfg.max_history
    return f"""{_fallback_ctes()}
SELECT user_id, window_start, avg_value AS observed,
  round(greatest(0.0::DOUBLE,
        CASE WHEN post_std > 0 THEN fc * post_std + post_mean ELSE post_mean END)
        + {NUDGE}, {ROUND_DP}) AS baseline,
  least(rn, {h}) AS history_size,
  round(post_mean + {NUDGE}, {ROUND_DP}) AS running_mean,
  round(coalesce(post_std, 0.0::DOUBLE) + {NUDGE}, {ROUND_DP}) AS running_std,
  round(trend_latest_u + {NUDGE}, {ROUND_DP}) AS trend_latest,
  round(trend_5season_u + {NUDGE}, {ROUND_DP}) AS trend_5season,
  'ewma_fallback' AS model
FROM fcst
"""


register(
    "baseline_fallback_oracle",
    oracle=_fallback_oracle_sql(),
    tags=("model", "A3", "A5", "A6", "A7", "A8", "stateful", "bench"),
)(baseline_fallback_oracle)


def pipeline_alerts_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference-pipeline parity in batch: window agg -> stateful
    baseline model -> latest-baseline as-of join -> deviation/alert
    filter (J2 thresholds z>=3 or pct>=50, severity high at 2x). This is
    the complete dataflow of flinkarima.py:392-476 as one lazy plan."""
    from flink_cookbook_spark.operators.metrics import (
        MIN_BASELINE,
        PCT_THRESHOLD,
        Z_THRESHOLD,
        _windowed,
        asof_join,
    )

    win = _windowed(spark, sf_dir)
    baselines = baseline_batch(
        win, FIXTURE_CONFIG, input_copartitioned=True
    ).select(
        "user_id",
        "window_start",
        F.col("baseline").alias("baseline_value"),
        F.col("running_std").alias("baseline_std"),
    )
    enriched = asof_join(
        win,
        baselines,
        key="user_id",
        left_ts="window_start",
        right_ts="window_start",
        value_cols=["baseline_value", "baseline_std"],
        how="inner",
    )
    deviation = F.col("avg_value") - F.col("baseline_value_asof")
    pct = F.when(
        F.col("baseline_value_asof") >= MIN_BASELINE,
        deviation / F.col("baseline_value_asof") * 100.0,
    ).otherwise(F.lit(0.0))
    z = F.when(
        F.col("baseline_std_asof") > 0, deviation / F.col("baseline_std_asof")
    ).otherwise(F.lit(0.0))
    return (
        enriched.withColumn("deviation", deviation)
        .withColumn("pct_deviation", pct)
        .withColumn("z_score", z)
        .where(
            (F.abs(F.col("z_score")) >= Z_THRESHOLD)
            | (F.abs(F.col("pct_deviation")) >= PCT_THRESHOLD)
        )
        .select(
            "user_id",
            "window_start",
            F.lit("cpu_deviation").alias("alert_type"),
            F.when(F.abs(F.col("z_score")) >= 2 * Z_THRESHOLD, "high")
            .otherwise("medium")
            .alias("severity"),
            F.col("avg_value").alias("observed"),
            F.col("baseline_value_asof").alias("baseline"),
            "deviation",
            "pct_deviation",
            "z_score",
            F.col("window_start_asof").alias("baseline_window_start"),
        )
    )


register(
    "pipeline_alerts_end_to_end",
    oracle=None,
    tags=("flagship", "model", "J1", "J2", "stateful"),
)(pipeline_alerts_end_to_end)


def pipeline_alerts_fallback_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP dataflow, hash-checked end-to-end: window agg ->
    EWMA-fallback baseline (the pure-SQL re-derivation above) ->
    latest-baseline as-of join -> deviation/alert filter, with DuckDB
    recomputing the identical chain. Together with the pytest pin that
    the SQL baseline equals the stateful loop, this closes the driver
    gap on the whole reference topology (flinkarima.py:392-476), not
    just its stages.

    The baselines are a filtered projection of the SAME window chain the
    raw side reads, so instead of the generic union+sweep as-of join
    (which scanned the memo twice and re-sorted the union) the baseline
    columns are computed in place on every window row (NULL off the emit
    cadence) and the latest-at-or-before lookup is one
    ``last(ignorenulls)`` sweep over the already-established per-user
    ordering — zero additional exchanges or sorts, identical match
    semantics (the sweep frame includes the current row, so an emit row
    is its own latest baseline, exactly the union sweep's tie-break),
    and identical rounded values (same expressions, same frames)."""
    from flink_cookbook_spark.operators.metrics import (
        MIN_BASELINE,
        PCT_THRESHOLD,
        Z_THRESHOLD,
    )

    scored = _fallback_scored(spark, sf_dir, all_rows=True)
    baseline_raw = F.greatest(
        F.lit(0.0),
        F.when(
            F.col("post_std") > 0,
            F.col("fc") * F.col("post_std") + F.col("post_mean"),
        ).otherwise(F.col("post_mean")),
    )
    marked = scored.select(
        "user_id",
        "window_start",
        "avg_value",
        F.when(F.col("_emit"), rnd(baseline_raw)).alias("_b_val"),
        F.when(F.col("_emit"), rnd(F.coalesce(F.col("post_std"), F.lit(0.0)))).alias(
            "_b_std"
        ),
        F.when(F.col("_emit"), F.col("window_start")).alias("_b_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("window_start")
    sweep = w.rowsBetween(Window.unboundedPreceding, 0)
    enriched = marked.select(
        "user_id",
        "window_start",
        "avg_value",
        F.last("_b_val", ignorenulls=True).over(sweep).alias("baseline_value_asof"),
        F.last("_b_std", ignorenulls=True).over(sweep).alias("baseline_std_asof"),
        F.last("_b_ts", ignorenulls=True).over(sweep).alias("window_start_asof"),
    ).where(F.col("window_start_asof").isNotNull())
    deviation = F.col("avg_value") - F.col("baseline_value_asof")
    pct = F.when(
        F.col("baseline_value_asof") >= MIN_BASELINE,
        deviation / F.col("baseline_value_asof") * 100.0,
    ).otherwise(F.lit(0.0))
    z = F.when(
        F.col("baseline_std_asof") > 0, deviation / F.col("baseline_std_asof")
    ).otherwise(F.lit(0.0))
    return (
        enriched.withColumn("deviation_u", deviation)
        .withColumn("pct_u", pct)
        .withColumn("z_u", z)
        .where((F.abs(F.col("z_u")) >= Z_THRESHOLD) | (F.abs(F.col("pct_u")) >= PCT_THRESHOLD))
        .select(
            "user_id",
            "window_start",
            F.lit("cpu_deviation").alias("alert_type"),
            F.when(F.abs(F.col("z_u")) >= 2 * Z_THRESHOLD, "high")
            .otherwise("medium")
            .alias("severity"),
            F.col("avg_value").alias("observed"),
            F.col("baseline_value_asof").alias("baseline"),
            rnd("deviation_u").alias("deviation"),
            rnd("pct_u").alias("pct_deviation"),
            rnd("z_u").alias("z_score"),
            F.col("window_start_asof").alias("baseline_window_start"),
        )
    )


def _alerts_oracle_sql() -> str:
    from flink_cookbook_spark.operators.metrics import (
        MIN_BASELINE,
        PCT_THRESHOLD,
        Z_THRESHOLD,
    )
    from flink_cookbook_spark.registry import NUDGE, ROUND_DP

    return f"""{_fallback_ctes()},
baselines AS (
  SELECT user_id, window_start,
         round(greatest(0.0::DOUBLE,
               CASE WHEN post_std > 0 THEN fc * post_std + post_mean
                    ELSE post_mean END) + {NUDGE}, {ROUND_DP}) AS baseline_value,
         round(coalesce(post_std, 0.0::DOUBLE) + {NUDGE}, {ROUND_DP}) AS baseline_std
  FROM fcst
),
enriched AS (
  SELECT r.user_id, r.window_start, r.avg_value,
         b.baseline_value, b.baseline_std, b.window_start AS baseline_window_start
  FROM windowed r ASOF JOIN baselines b
    ON r.user_id = b.user_id AND r.window_start >= b.window_start
),
scored AS (
  SELECT *,
         avg_value - baseline_value AS deviation_u,
         CASE WHEN baseline_value >= {MIN_BASELINE}
              THEN (avg_value - baseline_value) / baseline_value * 100.0
              ELSE 0.0::DOUBLE END AS pct_u,
         CASE WHEN baseline_std > 0
              THEN (avg_value - baseline_value) / baseline_std
              ELSE 0.0::DOUBLE END AS z_u
  FROM enriched
)
SELECT user_id, window_start,
       'cpu_deviation' AS alert_type,
       CASE WHEN abs(z_u) >= {2 * Z_THRESHOLD} THEN 'high' ELSE 'medium' END AS severity,
       avg_value AS observed,
       baseline_value AS baseline,
       round(deviation_u + {NUDGE}, {ROUND_DP}) AS deviation,
       round(pct_u + {NUDGE}, {ROUND_DP}) AS pct_deviation,
       round(z_u + {NUDGE}, {ROUND_DP}) AS z_score,
       baseline_window_start
FROM scored
WHERE abs(z_u) >= {Z_THRESHOLD} OR abs(pct_u) >= {PCT_THRESHOLD}
"""


register(
    "pipeline_alerts_fallback_oracle",
    oracle=_alerts_oracle_sql(),
    tags=("flagship", "model", "J1", "J2", "stateful", "bench"),
)(pipeline_alerts_fallback_oracle)


#: key subset for the method-dispatch proof: the CSS leg runs a REAL
#: optimizer per emitted record, so the query restricts to a few keys
#: (cost stays ~dozens of fits at any fixture SF — user_id is dense
#: from 0, so the subset is stable across scales).
DISPATCH_KEYS = 3


def baseline_method_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-dispatch proof as a HASH-CHECKED query (round-6 verdict #5):
    run the REAL stateful baseline loop (``baseline_batch``) under each
    forced method — ``auto`` (resolves statsmodels -> EWMA fallback in
    this container), ``css`` (the vendored seasonal-ARIMA optimizer,
    executing a genuine fit per emitted record), ``ewma`` — over a small
    key subset, and emit (method_requested, model, n_records).

    What the oracle pins: (a) the dispatch mapping itself — each leg's
    ``model`` tag, with the ``auto`` expectation computed AT
    REGISTRATION TIME via ``model_name`` so the oracle stays correct in
    an environment where statsmodels exists; (b) that the emit cadence
    is METHOD-INVARIANT and matches the closed-form count DuckDB derives
    from the windowed series (``rn % N = 0 AND min(rn, H) >= MIN``) —
    i.e. no forecaster silently swallows records on the fixture."""
    import dataclasses

    from flink_cookbook_spark.operators.metrics import _windowed

    win = _windowed(spark, sf_dir).where(F.col("user_id") < DISPATCH_KEYS)
    legs = []
    for m in ("auto", "css", "ewma"):
        cfg = dataclasses.replace(FIXTURE_CONFIG, method=m)
        legs.append(
            baseline_batch(win, cfg, input_copartitioned=True)
            .agg(
                F.max("model").alias("model"),
                F.count("*").cast("long").alias("n_records"),
            )
            .select(F.lit(m).alias("method_requested"), "model", "n_records")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _dispatch_oracle_sql() -> str:
    import dataclasses

    from flink_cookbook_spark.operators.metrics import _WINDOWED_CTE

    cfg = FIXTURE_CONFIG
    auto_model = model_name(dataclasses.replace(cfg, method="auto"))
    return f"""
WITH {_WINDOWED_CTE.strip()},
seq AS (
  SELECT row_number() OVER (PARTITION BY user_id ORDER BY window_start) AS rn
  FROM windowed WHERE user_id < {DISPATCH_KEYS}
),
emitted AS (
  SELECT CAST(count(*) AS BIGINT) AS n_records FROM seq
  WHERE rn % {cfg.emit_every_n} = 0
    AND least(rn, {cfg.max_history}) >= {cfg.min_history}
),
methods AS (
  SELECT * FROM (VALUES
    ('auto', '{auto_model}'),
    ('css', 'sarimax_css'),
    ('ewma', 'ewma_fallback')) AS t(method_requested, model))
SELECT m.method_requested, m.model, e.n_records
FROM methods m CROSS JOIN emitted e
"""


register(
    "baseline_method_dispatch",
    oracle=_dispatch_oracle_sql(),
    tags=("model", "A5", "dispatch"),
)(baseline_method_dispatch)
