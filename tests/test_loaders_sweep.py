"""CSV/JSON loaders (S1/S2), event-level sweep, sliding windows,
walk-forward CV, benchmark runner."""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import series_df

from time_series_data_anomaly_detection_spark.operators.labeling import (
    mark_anomaly_windows,
    top_value_labels,
)
from time_series_data_anomaly_detection_spark.operators.rolling import (
    sliding_windows,
)
from time_series_data_anomaly_detection_spark.operators.scaling import mad_scores
from time_series_data_anomaly_detection_spark.operators.sweep import (
    threshold_sweep_event,
)
from time_series_data_anomaly_detection_spark.plans.pipelines import (
    run_benchmark,
    walk_forward_cv,
)
from time_series_data_anomaly_detection_spark.sources import (
    load_labels_json,
    load_series_csv,
)


def test_load_series_csv_with_header(spark, tmp_path):
    p = tmp_path / "seriesA.csv"
    p.write_text(
        "timestamp,value\n2024-01-01 00:00:00,1.5\n2024-01-01 00:05:00,2.5\n"
    )
    df = load_series_csv(spark, str(p)).collect()
    assert len(df) == 2
    assert df[0].series_id == "seriesA"
    assert {r.value for r in df} == {1.5, 2.5}


def test_load_series_csv_headerless(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("2024-01-01 00:00:00,7.0\n2024-01-01 00:05:00,8.0\n")
    df = load_series_csv(spark, str(p), header=False).collect()
    assert {r.value for r in df} == {7.0, 8.0}
    assert all(r.timestamp is not None for r in df)


def test_load_labels_json(spark, tmp_path):
    p = tmp_path / "combined_labels.json"
    p.write_text(
        json.dumps(
            {
                "realKnownCause/a.csv": ["2024-01-01 03:00:00"],
                "realKnownCause/b.csv": [
                    "2024-01-02 00:00:00",
                    "2024-01-03 00:00:00",
                ],
            }
        )
    )
    out = load_labels_json(spark, str(p)).collect()
    assert len(out) == 3
    by_series = {}
    for r in out:
        by_series.setdefault(r.series_id, []).append(r.label_ts)
    assert len(by_series["realKnownCause/b.csv"]) == 2


@pytest.fixture(scope="module")
def burst_series(spark):
    rng = np.random.default_rng(11)
    y = rng.normal(10, 1, 400)
    for s in (100, 250):
        y[s : s + 4] += 25
    return series_df(spark, y)


def test_threshold_sweep_event(spark, burst_series):
    # label both burst STARTS explicitly (top-2 values can land in the
    # same burst and leave the other one an unlabeled false positive)
    base = pd.date_range("2024-01-01", periods=400, freq="30min")
    labels = spark.createDataFrame(
        pd.DataFrame(
            {"series_id": "s1", "label_ts": [base[100], base[250]]}
        )
    )
    lab = mark_anomaly_windows(mad_scores(burst_series), labels, 3)
    best = threshold_sweep_event(lab, "z_mad", "is_anomaly").collect()[0]
    # both bursts are 20+ sigma: some k must recover both events
    assert best.f1 == pytest.approx(1.0, abs=1e-6)
    assert best.rate <= 0.10


def test_sliding_windows_alignment(spark):
    s = series_df(spark, np.arange(100, dtype=float))
    out = sliding_windows(s, seq_len=5).orderBy("rn").collect()
    # first emitted row is rn=6 (needs 5 strict predecessors)
    assert out[0].rn == 6
    assert out[0].x_window == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert out[0].value == 5.0
    assert out[-1].x_window == [94.0, 95.0, 96.0, 97.0, 98.0]


def test_walk_forward_cv(spark, burst_series):
    out = walk_forward_cv(burst_series, model="ar", period=24).collect()
    assert len(out) == 1
    assert out[0].n_folds == 3
    assert out[0].mean_f1 is not None


def test_run_benchmark_leaderboard(spark, burst_series):
    lb = run_benchmark(burst_series, models=("stl", "ar")).collect()
    assert {r.model for r in lb} == {"stl", "ar"}
    # leaderboard sorted by f1 desc
    f1s = [r.f1 for r in lb]
    assert f1s == sorted(f1s, reverse=True)


def test_pacf_ar1_structure(spark):
    from time_series_data_anomaly_detection_spark.operators.acf import pacf

    rng = np.random.default_rng(9)
    y = np.zeros(2000)
    for i in range(1, 2000):
        y[i] = 0.7 * y[i - 1] + rng.normal()
    out = {r.lag: r.pacf for r in pacf(series_df(spark, y), max_lag=6).collect()}
    # AR(1): PACF(1) ~ rho, PACF(k>=2) ~ 0
    assert out[1] == pytest.approx(0.7, abs=0.06)
    for k in range(2, 7):
        assert abs(out[k]) < 0.1
