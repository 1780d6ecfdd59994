"""Gaussian-process forecaster (SURVEY §2.9 M4), pure numpy.

Reference: sklearn ``GaussianProcessRegressor`` with the composite
kernel ``C*RBF + C*ExpSineSquared(period=48) [+ weekly ExpSineSquared]
+ WhiteKernel`` over the row index, trained on the LAST 1000 train rows
(O(n³) cost control, ``src/run_gp.py:61-67``), predicting per-step
``(mean, std)``.

sklearn is unavailable; this is a from-scratch numpy GP with the same
kernel family and the same train-subsample semantics.  Hyperparameters
are FIXED (no marginal-likelihood optimization) so results are
deterministic — the reference's ``n_restarts_optimizer`` path is a
stochastic fit checked at metric tolerance anyway (SURVEY §5).

Spark shape: one Cholesky per series inside ``applyInPandas``; cap
keeps it ≤ O(1000³) per group regardless of series length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

GP_SCHEMA = (
    "series_id string, timestamp timestamp, value double, rn long, "
    "pred_mean double, pred_std double"
)


def _kernel(xa: np.ndarray, xb: np.ndarray, amp2: float, ls: float,
            period: float, pamp2: float, pls: float) -> np.ndarray:
    """RBF + periodic kernel. The feature is the (integer) row index,
    and the kernel is stationary, so k(x_i, x_j) = g(i−j) takes only
    |range(i−j)| ≤ n+m distinct values: evaluate g on the lag grid
    once and GATHER, instead of 2·n·m transcendental calls (the naive
    20k×1000 build was ~4 s/series; the gather is ~0.2 s)."""
    da = xa.astype(np.int64)
    db = xb.astype(np.int64)
    dmin = int(da.min()) - int(db.max())
    dmax = int(da.max()) - int(db.min())
    lags = np.arange(dmin, dmax + 1, dtype=float)
    g = amp2 * np.exp(-(lags**2) / (2 * ls**2)) + pamp2 * np.exp(
        -2 * np.sin(np.pi * np.abs(lags) / period) ** 2 / pls**2
    )
    idx = (da[:, None] - db[None, :]) - dmin
    return g[idx]


def gp_forecast(
    df: DataFrame,
    train_frac: float = 0.5,
    max_train: int = 1000,
    period: float = 24.0,
    length_scale: float = 50.0,
    noise: float = 0.1,
) -> DataFrame:
    """M4: per-series GP regression on the row index.

    Fits on the last ``max_train`` rows of the train fraction (the
    reference's subsample trick — kept as explicit app logic since it
    changes results, SURVEY §4), predicts mean/std for ALL rows.
    Output: ``pred_mean, pred_std`` columns.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y_all = pdf["value"].to_numpy(float)
        n = len(y_all)
        n_train = max(int(n * train_frac), 2)
        lo = max(n_train - max_train, 0)
        x_tr = np.arange(lo, n_train, dtype=float)
        y_tr = y_all[lo:n_train]
        mu, sd = float(y_tr.mean()), float(y_tr.std()) or 1.0
        yn = (y_tr - mu) / sd
        amp2, pamp2, pls = 1.0, 1.0, 1.0
        noise2 = noise**2
        K = _kernel(x_tr, x_tr, amp2, length_scale, period, pamp2, pls)
        K[np.diag_indices_from(K)] += noise2
        # one O(m³) inverse, then the per-point variance is a single
        # DGEMM (Ks @ Kinv) instead of a dense solve against an m×n
        # right-hand side — the solve was 10× the whole query's cost
        # at 20k points/series
        Kinv = np.linalg.inv(K)
        alpha = Kinv @ yn
        x_star = np.arange(n, dtype=float)
        Ks = _kernel(x_star, x_tr, amp2, length_scale, period, pamp2, pls)
        mean = Ks @ alpha
        var = (amp2 + pamp2 + noise2) - np.einsum("ij,ij->i", Ks @ Kinv, Ks)
        var = np.maximum(var, 1e-12)
        pdf["pred_mean"] = mean * sd + mu
        pdf["pred_std"] = np.sqrt(var) * sd
        return pdf[["series_id", "timestamp", "value", "rn", "pred_mean", "pred_std"]]

    return (
        df.select("series_id", "timestamp", "value", "rn")
        .groupBy("series_id")
        .applyInPandas(fit, GP_SCHEMA)
    )
