"""Kalman-filter state-space models (SURVEY §2.9 M2/M3), pure numpy.

The reference fits statsmodels ``UnobservedComponents``:
- M2 ``level='local level'`` (``src/kalman_model.py:9-17``): obs noise R,
  level-walk noise Q, MLE-fit, in-sample residuals + out-of-sample
  forecast with confidence intervals.
- M3 BSTS ``level='local linear trend'`` + seasonal
  (``src/bsts_model.py:12-50``).

statsmodels is not available in this environment, so the engine ships
its own Kalman filter with EM (deterministic, fixed iteration count)
for the variance hyperparameters.  Numerics therefore differ from the
reference's L-BFGS MLE — parity is at the metric level, not row level
(SURVEY §5 determinism note).

Spark shape: one ``applyInPandas`` per model; each group is one series,
fanned out across executors.  State per group is O(state_dim²) — tiny.
At 100 TB the constraint is rows-per-series, not series count; the
filter is O(T) per series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kalman_em_local_level(y: np.ndarray, n_iter: int = 30):
    """EM estimation of (q, r) for the local-level model, then a final
    filter pass.  Returns one-step-ahead predicted mean and variance."""
    n = len(y)
    var_y = float(np.var(y)) or 1.0
    q, r = var_y * 0.1, var_y * 0.9
    level0, p0 = float(y[0]), var_y
    for _ in range(n_iter):
        # forward filter
        mu = np.empty(n)
        p = np.empty(n)
        mu_pred = np.empty(n)
        p_pred = np.empty(n)
        m, pp = level0, p0
        for t in range(n):
            mp, ppp = m, pp + q
            mu_pred[t], p_pred[t] = mp, ppp
            k_gain = ppp / (ppp + r)
            m = mp + k_gain * (y[t] - mp)
            pp = (1 - k_gain) * ppp
            mu[t], p[t] = m, pp
        # RTS smoother
        mu_s = mu.copy()
        p_s = p.copy()
        for t in range(n - 2, -1, -1):
            c = p[t] / (p[t] + q)
            mu_s[t] = mu[t] + c * (mu_s[t + 1] - (mu[t]))
            p_s[t] = p[t] + c * c * (p_s[t + 1] - (p[t] + q))
        # M-step
        r = float(np.mean((y - mu_s) ** 2 + p_s))
        dm = np.diff(mu_s)
        q = float(np.mean(dm**2) + np.mean(p_s[1:] + p_s[:-1]) * 0.5)
        q = max(q, 1e-12)
        r = max(r, 1e-12)
        level0 = mu_s[0]
    return mu_pred, p_pred + r, q, r


KALMAN_SCHEMA = (
    "series_id string, timestamp timestamp, value double, rn long, "
    "pred_mean double, pred_lower double, pred_upper double, resid double"
)


def kalman_local_level(
    df: DataFrame,
    train_frac: float = 1.0,
    alpha: float = 0.05,
    dynamic: bool = True,
) -> DataFrame:
    """M2: per-series local-level Kalman one-step-ahead prediction.

    Columns added: ``pred_mean, pred_lower, pred_upper`` (predictive
    interval at 1-alpha via the Gaussian quantile) and ``resid``.
    With ``train_frac < 1`` the filter fits (EM) on the head fraction;
    the tail is forecast per ``dynamic``, mirroring the reference's
    ``predict_with_intervals(..., use_dynamic=...)``
    (``src/kalman_model.py:19-43``):

    - ``dynamic=True``: multi-step forecast — level frozen at the train
      end, variance growing (statsmodels ``get_prediction(dynamic=
      True)``).
    - ``dynamic=False``: one-step-ahead filtering continues through the
      tail with the train-fit ``(q, r)`` — the state updates on each
      observed test value but the hyperparameters never see test data.
    """
    zq = _norm_ppf(1 - alpha / 2)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        n_train = max(int(n * train_frac), 2)
        mu_pred, var_pred, q, r = _kalman_em_local_level(y[:n_train])
        if n_train < n:
            # reconstruct the filtered state at the last train row from
            # the one-step-predicted outputs (p_pred = var_pred - r)
            ppp = var_pred[-1] - r
            k_last = ppp / var_pred[-1]
            last_mu = mu_pred[-1] + k_last * (y[n_train - 1] - mu_pred[-1])
            if dynamic:
                h = np.arange(1, n - n_train + 1, dtype=float)
                fc_mean = np.full(n - n_train, last_mu)
                fc_var = (1 - k_last) * ppp + h * q + r
            else:
                m, pp = last_mu, (1 - k_last) * ppp
                fc_mean = np.empty(n - n_train)
                fc_var = np.empty(n - n_train)
                for t in range(n_train, n):
                    pv = pp + q
                    fc_mean[t - n_train] = m
                    fc_var[t - n_train] = pv + r
                    kg = pv / (pv + r)
                    m = m + kg * (y[t] - m)
                    pp = (1 - kg) * pv
            mu_pred = np.concatenate([mu_pred, fc_mean])
            var_pred = np.concatenate([var_pred, fc_var])
        sd = np.sqrt(var_pred)
        pdf["pred_mean"] = mu_pred
        pdf["pred_lower"] = mu_pred - zq * sd
        pdf["pred_upper"] = mu_pred + zq * sd
        pdf["resid"] = y - mu_pred
        return pdf[
            ["series_id", "timestamp", "value", "rn",
             "pred_mean", "pred_lower", "pred_upper", "resid"]
        ]

    from ._partition import udf_repartition

    return (
        udf_repartition(df.select("series_id", "timestamp", "value", "rn"), "series_id")
        .groupBy("series_id")
        .applyInPandas(fit, KALMAN_SCHEMA)
    )


KALMAN_FIXED_SCHEMA = (
    "series_id string, rn long, pred_mean double, pred_lower double, "
    "pred_upper double, resid double"
)


def kalman_fixed(
    df: DataFrame,
    q: float = 0.1,
    r: float = 1.0,
    p0: float = 10.0,
    alpha: float = 0.05,
) -> DataFrame:
    """M2 (oracle-checkable variant): local-level Kalman filter with
    FIXED (q, r) — the scalar recursion of the reference's filter
    (``src/kalman_model.py:9-43``) without the MLE step, so the whole
    model is a closed-form recurrence::

        pv = p + q;  k = pv / (pv + r)
        m' = m + k (y − m);  p' = (1 − k) pv

    initialized at ``m = y_1, p = p0``.  Every step is plain double
    arithmetic, which makes the model expressible as a DuckDB RECURSIVE
    CTE — the hash-gated member of the state-space family (the EM/MLE
    variants stay rows-only).  The expression tree below is kept
    textually in lockstep with the oracle so outputs are bit-identical
    (same IEEE ops on identical inputs).
    """
    zq = _norm_ppf(1 - alpha / 2)
    qv, rv, pz = float(q), float(r), float(p0)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        pm = np.empty(n)
        pvp = np.empty(n)
        m, p = float(y[0]), pz
        for t in range(n):
            pp = p + qv
            pm[t] = m
            pvp[t] = pp + rv
            k = pp / (pp + rv)
            m = m + k * (y[t] - m)
            p = (1.0 - k) * pp
        sd = np.sqrt(pvp)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"],
                "rn": pdf["rn"],
                "pred_mean": pm,
                "pred_lower": pm - zq * sd,
                "pred_upper": pm + zq * sd,
                "resid": y - pm,
            }
        )

    from ._partition import udf_repartition

    return (
        udf_repartition(df.select("series_id", "value", "rn"), "series_id")
        .groupBy("series_id")
        .applyInPandas(fit, KALMAN_FIXED_SCHEMA)
    )


def bsts_fixed(
    df: DataFrame,
    ql: float = 0.125,
    qb: float = 0.015625,
    r: float = 1.0,
    p0: float = 16.0,
    alpha: float = 0.05,
) -> DataFrame:
    """M3 (oracle-checkable variant): the local-linear-trend core of the
    reference's BSTS (``src/bsts_model.py:12-50``, ``level='local linear
    trend'``) with FIXED state variances instead of MLE — state
    ``[level, slope]``, transition ``[[1,1],[0,1]]``.  The 2-dim filter
    unrolls into seven scalar recurrences (2 means + 3 covariance
    entries + predicted mean/variance)::

        lp = l + b;  bp = b
        p11' = p11 + 2 p12 + p22 + ql;  p12' = p12 + p22;  p22' = p22 + qb
        f = p11' + r;  k1 = p11'/f;  k2 = p12'/f;  v = y - lp
        l = lp + k1 v;  b = bp + k2 v
        p11 = p11' - k1 p11';  p12 = p12' - k1 p12';  p22 = p22' - k2 p12'

    so the whole model carries a DuckDB RECURSIVE-CTE oracle, upgrading
    the BSTS family from rows-only to hash-gated (the seasonal blocks
    stay rows-only in :func:`bsts_forecast` — a period-``p`` dummy
    seasonal would need O(p²) recursive covariance columns).

    The default variances are DYADIC RATIONALS (0.125, 0.015625, 1.0,
    16.0): every anchor-step constant is then exact in both IEEE-754
    binary AND decimal arithmetic, so the engines' different literal
    handling cannot introduce even a 1-ulp seed difference — the
    recursion is bit-identical end to end (verified in
    ``tests/test_model_queries.py``).  The expression trees below are
    textually in lockstep with the oracle.
    """
    zq = _norm_ppf(1 - alpha / 2)
    QL, QB, RV, PZ = float(ql), float(qb), float(r), float(p0)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        pm = np.empty(n)
        pvp = np.empty(n)
        l, b = float(y[0]), 0.0
        p11, p12, p22 = PZ, 0.0, PZ
        for t in range(n):
            lp = l + b
            bp = b
            p11p = p11 + 2.0 * p12 + p22 + QL
            p12p = p12 + p22
            p22p = p22 + QB
            f = p11p + RV
            pm[t] = lp
            pvp[t] = f
            k1 = p11p / f
            k2 = p12p / f
            v = y[t] - lp
            l = lp + k1 * v
            b = bp + k2 * v
            p11 = p11p - k1 * p11p
            p12 = p12p - k1 * p12p
            p22 = p22p - k2 * p12p
        sd = np.sqrt(pvp)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"],
                "rn": pdf["rn"],
                "pred_mean": pm,
                "pred_lower": pm - zq * sd,
                "pred_upper": pm + zq * sd,
                "resid": y - pm,
            }
        )

    from ._partition import udf_repartition

    return (
        udf_repartition(df.select("series_id", "value", "rn"), "series_id")
        .groupBy("series_id")
        .applyInPandas(fit, KALMAN_FIXED_SCHEMA)
    )


def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation of the standard normal inverse
    CDF (|error| < 1.15e-9) — scipy is unavailable here."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        qv = np.sqrt(-2 * np.log(p))
        return (((((c[0] * qv + c[1]) * qv + c[2]) * qv + c[3]) * qv + c[4]) * qv + c[5]) / (
            (((d[0] * qv + d[1]) * qv + d[2]) * qv + d[3]) * qv + 1
        )
    if p <= phigh:
        qv = p - 0.5
        rr = qv * qv
        return (((((a[0] * rr + a[1]) * rr + a[2]) * rr + a[3]) * rr + a[4]) * rr + a[5]) * qv / (
            ((((b[0] * rr + b[1]) * rr + b[2]) * rr + b[3]) * rr + b[4]) * rr + 1
        )
    qv = np.sqrt(-2 * np.log(1 - p))
    return -(((((c[0] * qv + c[1]) * qv + c[2]) * qv + c[3]) * qv + c[4]) * qv + c[5]) / (
        (((d[0] * qv + d[1]) * qv + d[2]) * qv + d[3]) * qv + 1
    )


BSTS_SCHEMA = KALMAN_SCHEMA


def bsts_forecast(
    df: DataFrame,
    period: int = 24,
    train_frac: float = 0.5,
    alpha: float = 0.05,
    seasonal_periods: list[int] | None = None,
) -> DataFrame:
    """M3: local-linear-trend + seasonal state space, numpy Kalman.

    Two seasonal representations, matching the reference's
    ``fit_bsts`` (``src/bsts_model.py:12-50``):

    - ``seasonal_periods=None``: single DUMMY seasonal of ``period``
      (state ``[level, slope, s_1..s_{period-1}]``) — the reference's
      ``seasonal=seasonal_period`` branch.
    - ``seasonal_periods=[48, 336]``: TRIGONOMETRIC multi-seasonality
      (``freq_seasonal``) — per period p, ``min(p // 2, 10)`` harmonics
      (the reference's harmonic cap, ``src/bsts_model.py:29``), each a
      2-state rotation block with angle 2πj/p.

    Fixed variance ratios (deterministic in lieu of MLE).  Fits on the
    train fraction, dynamic multi-step forecast over the tail with
    growing variance, as the reference's ``predict_bsts(dynamic=True)``
    (``src/bsts_model.py:52-71``).
    """
    zq = _norm_ppf(1 - alpha / 2)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        min_rows = (max(seasonal_periods) if seasonal_periods else period) + 2
        n_train = max(int(n * train_frac), min_rows)
        n_train = min(n_train, n)
        var_y = float(np.var(y[:n_train])) or 1.0
        if seasonal_periods:
            # trigonometric blocks: state pairs (γ_j, γ*_j) per harmonic
            harmonics = [(p, min(int(p / 2), 10)) for p in seasonal_periods]
            dim = 2 + 2 * sum(h for _, h in harmonics)
            T = np.zeros((dim, dim))
            T[0, 0] = T[0, 1] = T[1, 1] = 1.0
            Z = np.zeros(dim)
            Z[0] = 1.0
            Q = np.zeros((dim, dim))
            i = 2
            for p, h in harmonics:
                for j in range(1, h + 1):
                    lam = 2.0 * np.pi * j / p
                    c, s = np.cos(lam), np.sin(lam)
                    T[i, i], T[i, i + 1] = c, s
                    T[i + 1, i], T[i + 1, i + 1] = -s, c
                    Z[i] = 1.0
                    Q[i, i] = Q[i + 1, i + 1] = 1e-5 * var_y
                    i += 2
            Q[0, 0] = 1e-3 * var_y
            Q[1, 1] = 1e-5 * var_y
            Rv = 0.3 * var_y
        else:
            m = period - 1
            dim = 2 + m
            # transition
            T = np.zeros((dim, dim))
            T[0, 0] = T[0, 1] = T[1, 1] = 1.0
            T[2, 2:] = -1.0
            for i in range(m - 1):
                T[3 + i, 2 + i] = 1.0
            Z = np.zeros(dim)
            Z[0] = Z[2] = 1.0
            # fixed variance ratios in lieu of MLE; tuned on synthetic
            # trend+daily-seasonal series (test-tail MAE ~= innovation sd)
            Q = np.zeros((dim, dim))
            Q[0, 0] = 1e-3 * var_y
            Q[1, 1] = 1e-5 * var_y
            Q[2, 2] = 1e-4 * var_y
            Rv = 0.3 * var_y
        a = np.zeros(dim)
        a[0] = y[0]
        P = np.eye(dim) * var_y * 10
        pred_mean = np.empty(n)
        pred_var = np.empty(n)
        for t in range(n):
            a_pred = T @ a
            P_pred = T @ P @ T.T + Q
            f_mean = Z @ a_pred
            f_var = Z @ P_pred @ Z + Rv
            pred_mean[t], pred_var[t] = f_mean, f_var
            if t < n_train:  # update only on train rows -> dynamic tail
                v = y[t] - f_mean
                K = (P_pred @ Z) / f_var
                a = a_pred + K * v
                P = P_pred - np.outer(K, K) * f_var
            else:
                a, P = a_pred, P_pred
        sd = np.sqrt(pred_var)
        pdf["pred_mean"] = pred_mean
        pdf["pred_lower"] = pred_mean - zq * sd
        pdf["pred_upper"] = pred_mean + zq * sd
        pdf["resid"] = y - pred_mean
        return pdf[
            ["series_id", "timestamp", "value", "rn",
             "pred_mean", "pred_lower", "pred_upper", "resid"]
        ]

    from ._partition import udf_repartition

    return (
        udf_repartition(df.select("series_id", "timestamp", "value", "rn"), "series_id")
        .groupBy("series_id")
        .applyInPandas(fit, BSTS_SCHEMA)
    )
