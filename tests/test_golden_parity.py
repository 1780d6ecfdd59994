"""Parity against the reference's golden artifacts on REAL NAB data
(SURVEY §5: golden CSVs are the reference's correctness surface).

The input series (timestamp, value) is embedded in each golden CSV, so
these tests replay OUR operators on the reference's exact input and
compare outputs:

- STL: our robust decomposition is a from-scratch Cleveland-style
  implementation (statsmodels absent here), so parity is at signal
  level against the golden Loess output: trend R² > 0.85, seasonal
  correlation > 0.95, residual scale within 3x (measured: 0.92 /
  0.97 / 2.6 — a fixed-width smoother can't equal adaptive Loess
  point-for-point).
- BOCPD: the reference's cp_prob output is identically the hazard
  (SURVEY's algebra note, confirmed by the artifact) — ours must be
  exactly 1/lam everywhere too.
"""

import os

import numpy as np
import pandas as pd
import pytest

from time_series_data_anomaly_detection_spark.sources import with_row_index

GOLDEN_STL = (
    "/root/reference/notebooks/results/stl/realKnownCause__nyc_taxi.csv/"
    "stl_results.csv"
)
GOLDEN_BOCPD = (
    "/root/reference/results/bocpd/realKnownCause__nyc_taxi.csv/cp_probs.csv"
)


def _series_frame(spark, golden: pd.DataFrame):
    pdf = pd.DataFrame(
        {
            "series_id": "nyc_taxi",
            "timestamp": pd.to_datetime(golden["timestamp"]),
            "value": golden["value"].astype(float),
            "event_id": np.arange(len(golden), dtype="int64"),
        }
    )
    return with_row_index(spark.createDataFrame(pdf))


@pytest.mark.skipif(not os.path.exists(GOLDEN_STL), reason="no reference")
def test_stl_signal_parity_nyc_taxi(spark):
    from time_series_data_anomaly_detection_spark.functions import stl_decompose

    golden = pd.read_csv(GOLDEN_STL)
    ours = (
        stl_decompose(_series_frame(spark, golden), period=48)
        .orderBy("rn")
        .toPandas()
    )
    assert len(ours) == len(golden)

    g_trend = golden["trend"].to_numpy(float)
    o_trend = ours["trend"].to_numpy(float)
    ss_res = float(((g_trend - o_trend) ** 2).sum())
    ss_tot = float(((g_trend - g_trend.mean()) ** 2).sum())
    r2 = 1 - ss_res / ss_tot
    assert r2 > 0.85, f"trend R2 {r2}"

    corr = float(
        np.corrcoef(golden["seasonal"].to_numpy(float), ours["seasonal"])[0, 1]
    )
    assert corr > 0.95, f"seasonal corr {corr}"

    g_mad = float(np.median(np.abs(golden["residual"])))
    o_mad = float(np.median(np.abs(ours["resid"])))
    assert 0.3 < o_mad / g_mad < 3.0, f"residual MAD ratio {o_mad / g_mad}"


@pytest.mark.skipif(not os.path.exists(GOLDEN_BOCPD), reason="no reference")
def test_bocpd_cp_prob_parity_nyc_taxi(spark):
    from time_series_data_anomaly_detection_spark.functions import (
        bocpd_changepoints,
    )

    golden = pd.read_csv(GOLDEN_BOCPD)
    ours = (
        bocpd_changepoints(_series_frame(spark, golden), hazard_lam=100.0)
        .orderBy("rn")
        .toPandas()
    )
    assert len(ours) == len(golden)
    # the reference artifact is 0.01 everywhere (constant hazard); ours
    # must reproduce that exactly, and the golden confirms it
    np.testing.assert_allclose(
        golden["cp_prob"].to_numpy(float), 0.01, atol=1e-12
    )
    np.testing.assert_allclose(
        ours["cp_prob"].to_numpy(float), 0.01, atol=1e-9
    )


GOLDEN_EBSTS = (
    "/root/reference/results/enhanced_bsts/realKnownCause__nyc_taxi.csv/"
    "predictions.csv"
)


@pytest.mark.skipif(
    not (os.path.exists(GOLDEN_STL) and os.path.exists(GOLDEN_EBSTS)),
    reason="no reference",
)
def test_enhanced_bsts_multiseasonal_parity_nyc_taxi(spark):
    """Multi-seasonal (trigonometric [48, 336]) BSTS vs the reference's
    Enhanced BSTS golden (src/bsts_model.py:12-50, freq_seasonal with
    the min(p/2, 10) harmonic cap; run config src/run_bsts.py:16,
    train_frac=0.5).

    The golden's own 5160-step dynamic mean DIVERGES (its tail MAE is
    1.2e6 on ~2e4-valued data — statsmodels LLT multi-step slope
    extrapolation), so point-level parity is meaningless; metric-level
    agreement is asserted instead:
    - detrended seasonal SHAPE of the two forecasts correlates (the
      [48,336] harmonic structure matches),
    - our first-week forecast error is no worse than the golden's
      (matches-or-beats),
    - the multi-seasonal variant beats our own dummy-daily variant on
      the same horizon (the weekly component is real).
    """
    from time_series_data_anomaly_detection_spark.functions import bsts_forecast

    stl = pd.read_csv(GOLDEN_STL)
    gold = pd.read_csv(GOLDEN_EBSTS)
    df = _series_frame(spark, stl)
    ours = (
        bsts_forecast(df, train_frac=0.5, seasonal_periods=[48, 336])
        .orderBy("rn")
        .toPandas()
    )
    n = len(stl)
    n_train = int(n * 0.5)
    y = stl["value"].to_numpy(float)[n_train:]
    om = ours["pred_mean"].to_numpy()[n_train:]
    gm = gold["bsts_mean"].to_numpy()
    assert len(om) == len(gm)

    t = np.arange(len(om), dtype=float)

    def detrend(v):
        return v - np.polyval(np.polyfit(t, v, 1), t)

    shape_corr = np.corrcoef(detrend(om), detrend(gm))[0, 1]
    assert shape_corr > 0.8  # measured 0.847

    week = 336
    our_mae = np.abs(y[:week] - om[:week]).mean()
    gold_mae = np.abs(y[:week] - gm[:week]).mean()
    assert our_mae <= gold_mae  # measured 7k vs 79k

    dummy = (
        bsts_forecast(df, period=48, train_frac=0.5).orderBy("rn").toPandas()
    )
    dm = dummy["pred_mean"].to_numpy()[n_train:]
    assert our_mae < np.abs(y[:week] - dm[:week]).mean()


@pytest.mark.skipif(not os.path.exists(GOLDEN_STL), reason="no reference")
def test_lstm_numpy_backend_learns_nyc_taxi(spark):
    """M5 on the reference's real input (src/lstm_model.py:32-91 trains
    LSTM(1→64)+Linear on 48-step windows of nyc_taxi): the numpy BPTT
    backend must produce a one-step forecast that beats the persistence
    baseline on the same series — parity is behavioral, not row-level
    (seeded-stochastic training, SURVEY §5)."""
    from time_series_data_anomaly_detection_spark.functions.lstm import (
        lstm_forecast,
    )

    golden = pd.read_csv(GOLDEN_STL)
    ours = (
        lstm_forecast(
            _series_frame(spark, golden), seq_len=48, hidden=24, epochs=8,
            batch=64, lr=3e-3,
        )
        .orderBy("rn")
        .toPandas()
    )
    y = golden["value"].to_numpy(float)
    mae = np.abs(ours["resid"].to_numpy()[48:]).mean()
    persist = np.abs(np.diff(y)).mean()
    assert mae < persist, (mae, persist)
