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


GOLDEN_KALMAN_PRED = (
    "/root/reference/notebooks/results/kalman/realKnownCause__nyc_taxi.csv/"
    "predictions.csv"
)
GOLDEN_KALMAN_METRICS = (
    "/root/reference/notebooks/results/kalman/realKnownCause__nyc_taxi.csv/"
    "metrics.json"
)
GOLDEN_HYBRID_PRED = (
    "/root/reference/notebooks/results/hybrid/realKnownCause__nyc_taxi.csv/"
    "predictions.csv"
)
GOLDEN_HYBRID_METRICS = (
    "/root/reference/notebooks/results/hybrid/realKnownCause__nyc_taxi.csv/"
    "metrics.json"
)
GOLDEN_GP_METRICS = (
    "/root/reference/results/gp/realKnownCause__nyc_taxi.csv/metrics.json"
)


def _flag_frame(spark, pred_csv: str, flag_col: str):
    g = pd.read_csv(pred_csv)
    pdf = pd.DataFrame(
        {
            "series_id": "nyc_taxi",
            "rn": np.arange(len(g), dtype="int64"),
            "is_anomaly": g["is_anomaly"].astype("int32"),
            "flag": g[flag_col].astype("int32"),
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.skipif(
    not os.path.exists(GOLDEN_KALMAN_PRED), reason="no reference"
)
def test_event_metrics_reproduce_kalman_artifact(spark):
    """A2 quality parity for the Kalman leaderboard row: our event
    metrics over the reference's own (is_anomaly, detected) columns must
    reproduce notebooks/results/kalman/.../metrics.json event_level
    EXACTLY (tp=5, n_pred=200, F1=0.048780...; flags pre-persistence-
    filtered in the artifact, event grouping at gap=0)."""
    import json

    from time_series_data_anomaly_detection_spark.operators.evaluate import (
        event_level_metrics,
    )

    want = json.load(open(GOLDEN_KALMAN_METRICS))["event_level"]
    m = event_level_metrics(
        _flag_frame(spark, GOLDEN_KALMAN_PRED, "detected"),
        gap=0,
        persist_p=1,
    ).collect()[0]
    assert m["tp"] == want["tp"] == 5
    assert m["n_pred_events"] == want["n_pred_events"] == 200
    assert m["n_true_events"] == want["n_true_events"] == 5
    np.testing.assert_allclose(m["f1"], want["f1"], atol=1e-12)
    np.testing.assert_allclose(m["precision"], want["precision"], atol=1e-12)
    np.testing.assert_allclose(m["recall"], want["recall"], atol=1e-12)


@pytest.mark.skipif(
    not os.path.exists(GOLDEN_HYBRID_PRED), reason="no reference"
)
def test_event_metrics_reproduce_hybrid_artifact(spark):
    """A2/P15 quality parity for the 3-branch hybrid (README.md:16 row):
    our event metrics over the artifact's detected_hybrid flags must
    reproduce notebooks/results/hybrid/.../metrics.json event_level
    EXACTLY (tp=2, fp=3, F1=0.571428...; run_hybrid evaluates at
    gap=3, src/run_hybrid.py:155)."""
    import json

    from time_series_data_anomaly_detection_spark.operators.evaluate import (
        event_level_metrics,
    )

    want = json.load(open(GOLDEN_HYBRID_METRICS))["event_level"]
    m = event_level_metrics(
        _flag_frame(spark, GOLDEN_HYBRID_PRED, "detected_hybrid"),
        gap=3,
        persist_p=1,
    ).collect()[0]
    assert m["tp"] == want["tp"] == 2
    assert m["n_pred_events"] == want["n_pred_events"] == 5
    np.testing.assert_allclose(m["f1"], want["f1"], atol=1e-12)
    np.testing.assert_allclose(m["precision"], want["precision"], atol=1e-12)
    np.testing.assert_allclose(m["recall"], want["recall"], atol=1e-12)


@pytest.mark.skipif(
    not (os.path.exists(GOLDEN_STL) and os.path.exists(GOLDEN_GP_METRICS)),
    reason="no reference",
)
def test_gp_pipeline_reproduces_reference_f1_nyc_taxi(spark):
    """M4 END-TO-END quality parity on the real NAB taxi series: our GP
    (composite daily+weekly kernel, last-1000 train subsample) + rolling
    sigma z-score + event-F1 threshold sweep must land on the
    reference's published operating point (results/gp/.../metrics.json:
    best_k=3.5, Event-F1=0.3333 — precision 1.0, recall 0.2).  The whole
    detection tail is exact algebra, so the assertion is exact; the GP
    fit itself is a reimplementation, hence parity at the selected
    operating point rather than per-point forecasts."""
    import json

    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark.functions.gp import (
        gp_forecast,
    )
    from time_series_data_anomaly_detection_spark.operators.rolling import (
        rolling_stats,
    )
    from time_series_data_anomaly_detection_spark.operators.sweep import (
        threshold_sweep_event,
    )

    golden = pd.read_csv(GOLDEN_STL)
    df = _series_frame(spark, golden)
    labels = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_id": "nyc_taxi",
                "rn": np.arange(1, len(golden) + 1, dtype="int64"),
                "is_anomaly": golden["is_anomaly"].astype("int32"),
            }
        )
    )
    fc = gp_forecast(
        df.select("series_id", "timestamp", "value", "rn"),
        train_frac=0.5,
        max_train=1000,
        period=48.0,
        period2=336.0,
    ).withColumn("resid", F.col("value") - F.col("pred_mean"))
    train_end = len(golden) // 2
    test = fc.filter(F.col("rn") > train_end)  # rn is 1-based
    rs = rolling_stats(test, "resid", 48, 5)
    z = rs.withColumn(
        "z",
        F.abs(F.col("resid") - F.col("roll_mean"))
        / (F.col("roll_std") + F.lit(1e-6)),
    ).join(labels, ["series_id", "rn"])
    best = threshold_sweep_event(
        z,
        score_col="z",
        truth_col="is_anomaly",
        ks=list(np.linspace(2.0, 10.0, 17)),
        gap=3,
        persist_p=2,
        max_rate=0.10,
    ).collect()[0]
    want = json.load(open(GOLDEN_GP_METRICS))
    assert best["best_k"] == want["best_k"] == 3.5
    np.testing.assert_allclose(
        best["f1"], want["event_level"]["f1"], atol=1e-9
    )
    np.testing.assert_allclose(
        best["precision"], want["event_level"]["precision"], atol=1e-9
    )
    np.testing.assert_allclose(
        best["recall"], want["event_level"]["recall"], atol=1e-9
    )


GOLDEN_LSTM_PRED = (
    "/root/reference/notebooks/results/lstm/realKnownCause__nyc_taxi.csv/"
    "predictions.csv"
)
GOLDEN_LSTM_METRICS = (
    "/root/reference/notebooks/results/lstm/realKnownCause__nyc_taxi.csv/"
    "metrics.json"
)
GOLDEN_BSTS_PRED = (
    "/root/reference/results/bsts/realKnownCause__nyc_taxi.csv/"
    "predictions.csv"
)
GOLDEN_BSTS_METRICS = (
    "/root/reference/results/bsts/realKnownCause__nyc_taxi.csv/metrics.json"
)


@pytest.mark.skipif(
    not os.path.exists(GOLDEN_LSTM_PRED), reason="no reference"
)
def test_event_metrics_reproduce_lstm_artifact(spark):
    """A2 quality parity for the LSTM leaderboard row (BASELINE.md:
    LSTM NYC Taxi F1 0.4444): our event metrics over the artifact's own
    (is_anomaly, detected) columns must reproduce
    notebooks/results/lstm/.../metrics.json event_level EXACTLY
    (tp=2, fp=2, n_pred=4, n_true=5; run_lstm evaluates at gap=3 with
    flags already persist-filtered, src/run_lstm.py:110,149)."""
    import json

    from time_series_data_anomaly_detection_spark.operators.evaluate import (
        event_level_metrics,
    )

    want = json.load(open(GOLDEN_LSTM_METRICS))["event_level"]
    m = event_level_metrics(
        _flag_frame(spark, GOLDEN_LSTM_PRED, "detected"),
        gap=3,
        persist_p=1,
    ).collect()[0]
    assert m["tp"] == want["tp"] == 2
    assert m["fp"] == want["fp"] == 2
    assert m["n_pred_events"] == want["n_pred_events"] == 4
    assert m["n_true_events"] == want["n_true_events"] == 5
    np.testing.assert_allclose(m["f1"], want["f1"], atol=1e-12)
    np.testing.assert_allclose(m["precision"], want["precision"], atol=1e-12)
    np.testing.assert_allclose(m["recall"], want["recall"], atol=1e-12)


@pytest.mark.skipif(
    not os.path.exists(GOLDEN_BSTS_PRED), reason="no reference"
)
def test_event_metrics_reproduce_bsts_artifact(spark):
    """A2 quality parity for the plain-BSTS leaderboard row (BASELINE.md:
    BSTS NYC Taxi F1 0.1538): metrics are computed on the TEST split
    only (src/run_bsts.py:102 evaluates flags_test at gap=3; the
    predictions.csv carries a split column for the val/test halves),
    reproducing results/bsts/.../metrics.json event_level EXACTLY
    (tp=1, fp=9, n_pred=10, n_true=3)."""
    import json

    want = json.load(open(GOLDEN_BSTS_METRICS))["event_level"]
    g = pd.read_csv(GOLDEN_BSTS_PRED)
    g = g[g["split"] == "Test"].reset_index(drop=True)
    pdf = pd.DataFrame(
        {
            "series_id": "nyc_taxi",
            "rn": np.arange(len(g), dtype="int64"),
            "is_anomaly": g["is_anomaly"].astype("int32"),
            "flag": g["detected"].astype("int32"),
        }
    )
    from time_series_data_anomaly_detection_spark.operators.evaluate import (
        event_level_metrics,
    )

    m = event_level_metrics(
        spark.createDataFrame(pdf), gap=3, persist_p=1
    ).collect()[0]
    assert m["tp"] == want["tp"] == 1
    assert m["fp"] == want["fp"] == 9
    assert m["n_pred_events"] == want["n_pred_events"] == 10
    assert m["n_true_events"] == want["n_true_events"] == 3
    np.testing.assert_allclose(m["f1"], want["f1"], atol=1e-12)
    np.testing.assert_allclose(m["precision"], want["precision"], atol=1e-12)
    np.testing.assert_allclose(m["recall"], want["recall"], atol=1e-12)
