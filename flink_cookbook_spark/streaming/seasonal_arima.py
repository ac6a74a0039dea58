"""Vendored seasonal-ARIMA fit: CSS estimation of ARIMA(1,1,1)x(0,1,1,s).

The reference fits ``SARIMAX(order=(1,1,1), seasonal_order=(0,1,1,s))``
via statsmodels (/root/reference/src/flinkarima.py:226-235). statsmodels
is not installed in this container, so this module provides the same
MODEL — identical differencing, identical ARMA structure — estimated by
classic Box-Jenkins conditional sum of squares instead of the state-space
Kalman filter, with a deterministic Nelder-Mead simplex (Nelder & Mead
1965) as the optimizer. Pure numpy; ~no dependencies.

Model, in backshift notation (B z_t = z_{t-1}):

    (1 - phi B) (1 - B)(1 - B^s) z_t = (1 + theta B)(1 + Theta B^s) e_t

i.e. after differencing w_t = (1-B)(1-B^s) z_t, the ARMA recursion is

    e_t = w_t - phi w_{t-1} - theta e_{t-1} - Theta e_{t-s}
          - theta*Theta e_{t-s-1}

with pre-sample w/e conditioned to zero (the "conditional" in CSS).
CSS and exact ML agree asymptotically; on short histories they differ
slightly — numerical closeness to statsmodels is pinned by an
environment-gated parity test (tests/test_sarimax.py), and the
structural properties (seasonal tracking, residual whitening) are
asserted unconditionally.

Everything here is driver-free math: the fit runs inside the same
Arrow-batched mapInPandas / applyInPandasWithState boundary as the
other forecasters (streaming/sarimax.py), one bounded history per key.
"""

from __future__ import annotations

import numpy as np

#: parameter box: CSS is computed conditionally, so we only need to keep
#: the optimizer away from the +-1 boundary blow-ups.
_PARAM_BOUND = 0.98


def difference(z: np.ndarray, s: int) -> np.ndarray:
    """w = (1-B)(1-B^s) z — regular then seasonal differencing."""
    z = np.asarray(z, dtype=np.float64)
    w = np.diff(z)
    if len(w) > s:
        w = w[s:] - w[:-s]
    return w


def css_residuals(
    w: np.ndarray, phi: float, theta: float, bigtheta: float, s: int
) -> np.ndarray:
    """Innovation sequence under the ARMA(1,1)x(0,1)_s recursion with
    zero pre-sample conditioning."""
    n = len(w)
    eps = np.zeros(n)
    tt = theta * bigtheta
    for t in range(n):
        acc = w[t]
        if t >= 1:
            acc -= phi * w[t - 1] + theta * eps[t - 1]
        if t >= s:
            acc -= bigtheta * eps[t - s]
        if t >= s + 1:
            acc -= tt * eps[t - s - 1]
        eps[t] = acc
    return eps


def _css_objective(w: np.ndarray, s: int):
    def obj(params: np.ndarray) -> float:
        phi, theta, bigtheta = params
        if max(abs(phi), abs(theta), abs(bigtheta)) > _PARAM_BOUND:
            return 1e100  # hard box: keeps the simplex inside the region
        eps = css_residuals(w, phi, theta, bigtheta, s)
        return float(np.dot(eps, eps))

    return obj


def nelder_mead(
    obj,
    x0: np.ndarray,
    step: float = 0.25,
    max_iter: int = 200,
    tol: float = 1e-10,
) -> np.ndarray:
    """Deterministic Nelder-Mead simplex (standard 1965 coefficients:
    reflection 1, expansion 2, contraction 0.5, shrink 0.5). No
    randomness anywhere, so identical inputs give identical fits."""
    n = len(x0)
    simplex = [np.asarray(x0, dtype=np.float64)]
    for i in range(n):
        v = simplex[0].copy()
        v[i] += step
        simplex.append(v)
    vals = [obj(v) for v in simplex]
    for _ in range(max_iter):
        order = np.argsort(vals, kind="stable")
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        if abs(vals[-1] - vals[0]) <= tol * (abs(vals[0]) + tol):
            break
        centroid = np.mean(simplex[:-1], axis=0)
        worst = simplex[-1]
        refl = centroid + (centroid - worst)
        f_refl = obj(refl)
        if f_refl < vals[0]:
            exp = centroid + 2.0 * (centroid - worst)
            f_exp = obj(exp)
            if f_exp < f_refl:
                simplex[-1], vals[-1] = exp, f_exp
            else:
                simplex[-1], vals[-1] = refl, f_refl
        elif f_refl < vals[-2]:
            simplex[-1], vals[-1] = refl, f_refl
        else:
            contr = centroid + 0.5 * (worst - centroid)
            f_contr = obj(contr)
            if f_contr < vals[-1]:
                simplex[-1], vals[-1] = contr, f_contr
            else:  # shrink toward the best vertex
                best = simplex[0]
                simplex = [best] + [best + 0.5 * (v - best) for v in simplex[1:]]
                vals = [vals[0]] + [obj(v) for v in simplex[1:]]
    i_best = int(np.argmin(vals))
    return simplex[i_best]


def fit_css(z: np.ndarray, s: int) -> tuple[float, float, float]:
    """CSS-estimated (phi, theta, Theta) for ARIMA(1,1,1)x(0,1,1,s).

    Deterministic: fixed start point (0.1, 0.1, 0.1) and fixed simplex
    step, so the same history always produces the same parameters."""
    w = difference(z, s)
    if len(w) < 3:
        return 0.0, 0.0, 0.0
    obj = _css_objective(w, s)
    best = nelder_mead(obj, np.array([0.1, 0.1, 0.1]))
    return float(best[0]), float(best[1]), float(best[2])


def forecast_one_step(z: np.ndarray, s: int) -> float:
    """Fit by CSS, then one-step-ahead forecast.

    w-forecast: what the ARMA recursion predicts for the next innovation-
    free step; then invert the differencing:
        z_{n+1} = w_hat + z_n + z_{n+1-s} - z_{n-s}
    (requires n >= s+1 history; shorter histories fall back to the last
    value, mirroring the EWMA fallback's guard).
    """
    z = np.asarray(z, dtype=np.float64)
    n = len(z)
    if n < s + 2:
        return float(z[-1]) if n else 0.0
    phi, theta, bigtheta = fit_css(z, s)
    w = difference(z, s)
    eps = css_residuals(w, phi, theta, bigtheta, s)
    m = len(w)
    w_hat = phi * w[m - 1] + theta * eps[m - 1]
    if m >= s:
        w_hat += bigtheta * eps[m - s]
    if m >= s + 1:
        w_hat += theta * bigtheta * eps[m - s - 1]
    return float(w_hat + z[n - 1] + z[n - s] - z[n - s - 1])
