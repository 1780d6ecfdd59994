"""Robust STL-style decomposition (SURVEY §2.9 M1), pure numpy.

Reference: statsmodels ``STL(values, period, robust=True)``
(``src/utils.py:5-29``).  statsmodels is unavailable; this implements
an iterated moving-average decomposition with robustness weights
(Tukey biweight on residuals, as in Cleveland's STL outer loop):

  repeat n_outer times:
    trend    = centered 2×m weighted MA of (value, weights)
    detrended= value - trend
    seasonal = weighted phase means of detrended, centered
    resid    = value - trend - seasonal
    weights  = biweight(resid / (6 * median|resid|))

It is not Loess-identical to statsmodels, but reproduces the robust
spike-resistance the reference relies on for anomaly scoring (parity
at metric level, SURVEY §5).  The non-robust single pass equals
``operators.decompose.classical_decompose``, which IS oracle-checked.

Spark shape: per-series ``applyInPandas``; O(T · n_outer) per series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

STL_SCHEMA = (
    "series_id string, timestamp timestamp, value double, rn long, "
    "trend double, seasonal double, resid double"
)


def _weighted_centered_ma(y: np.ndarray, w: np.ndarray, period: int) -> np.ndarray:
    """Centered 2×m moving average with observation weights; edges use
    the partial window (no nulls, unlike the strict classical edges)."""
    half = period // 2
    n = len(y)
    kernel = np.ones(period + 1)
    if period % 2 == 0:
        kernel[0] = kernel[-1] = 0.5
    num = np.convolve(y * w, kernel, mode="full")
    den = np.convolve(w, kernel, mode="full")
    center = np.arange(n) + half
    return num[center] / np.maximum(den[center], 1e-12)


def stl_series(
    y: np.ndarray, phase: np.ndarray, period: int, n_outer: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    w = np.ones(len(y))
    trend = np.zeros(len(y))
    seasonal = np.zeros(len(y))
    for _ in range(n_outer):
        trend = _weighted_centered_ma(y, w, period)
        detr = y - trend
        seasonal = np.zeros(len(y))
        pm = {}
        for ph in np.unique(phase):
            mask = phase == ph
            wm = w[mask]
            pm[ph] = float(np.average(detr[mask], weights=np.maximum(wm, 1e-12)))
        grand = float(np.mean(list(pm.values())))
        for ph, v in pm.items():
            seasonal[phase == ph] = v - grand
        resid = y - trend - seasonal
        s0 = np.median(np.abs(resid))
        if s0 <= 0:
            break
        u = np.clip(resid / (6 * s0), -1, 1)
        w = (1 - u**2) ** 2
    resid = y - trend - seasonal
    return trend, seasonal, resid


def stl_decompose(
    df: DataFrame, period: int = 24, n_outer: int = 3, phase_col: str | None = None
) -> DataFrame:
    """M1: robust decomposition columns trend/seasonal/resid per series.

    Phase defaults to ``rn % period`` (positional, like statsmodels);
    pass ``phase_col`` to use e.g. hour-of-day on calendar grids.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        phase = (
            pdf[phase_col].to_numpy()
            if phase_col
            else (pdf["rn"].to_numpy() % period)
        )
        trend, seasonal, resid = stl_series(y, phase, period, n_outer)
        pdf["trend"], pdf["seasonal"], pdf["resid"] = trend, seasonal, resid
        return pdf[
            ["series_id", "timestamp", "value", "rn", "trend", "seasonal", "resid"]
        ]

    cols = ["series_id", "timestamp", "value", "rn"] + (
        [phase_col] if phase_col else []
    )
    return df.select(*cols).groupBy("series_id").applyInPandas(fit, STL_SCHEMA)
