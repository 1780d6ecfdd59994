"""Label-window marking (src/load_nab.py:46-61) and robust scaling
(src/utils.py:31-38) semantics."""

import numpy as np
import pandas as pd
import pytest

from conftest import series_df
from time_series_data_anomaly_detection_spark.operators import (
    fractional_split,
    global_zscore,
    mad_scores,
    mark_anomaly_windows,
)


def _labels(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["series_id", "label_ts"])
    )


def _anoms(df):
    return [r.is_anomaly for r in df.orderBy("rn").collect()]


def test_exact_grid_label(spark):
    df = series_df(spark, range(10))  # 30-min grid from 2024-01-01
    labels = _labels(spark, [("s1", pd.Timestamp("2024-01-01 02:00:00"))])  # rn=5
    got = _anoms(mark_anomaly_windows(df, labels, window_size=1))
    assert got == [0, 0, 0, 1, 1, 1, 0, 0, 0, 0]


def test_off_grid_label_anchors_to_next_row(spark):
    # searchsorted: first row with ts >= label -> 02:15 anchors at 02:30 (rn=6)
    df = series_df(spark, range(10))
    labels = _labels(spark, [("s1", pd.Timestamp("2024-01-01 02:15:00"))])
    got = _anoms(mark_anomaly_windows(df, labels, window_size=1))
    assert got == [0, 0, 0, 0, 1, 1, 1, 0, 0, 0]


def test_label_after_series_end_clamps(spark):
    # reference semantics: searchsorted leaves idx one past the end, so
    # the clipped window marks [n-w+1, n] (rows 5..6 here), not [n-w, n]
    df = series_df(spark, range(6))
    labels = _labels(spark, [("s1", pd.Timestamp("2024-02-01"))])
    got = _anoms(mark_anomaly_windows(df, labels, window_size=2))
    assert got == [0, 0, 0, 0, 1, 1]


def test_label_before_start_clamps(spark):
    df = series_df(spark, range(6))
    labels = _labels(spark, [("s1", pd.Timestamp("2023-12-01"))])
    got = _anoms(mark_anomaly_windows(df, labels, window_size=2))
    assert got == [1, 1, 1, 0, 0, 0]


def test_overlapping_windows_collapse(spark):
    df = series_df(spark, range(8))
    labels = _labels(
        spark,
        [("s1", pd.Timestamp("2024-01-01 01:00:00")),
         ("s1", pd.Timestamp("2024-01-01 02:00:00"))],
    )
    got = _anoms(mark_anomaly_windows(df, labels, window_size=1))
    assert got == [0, 1, 1, 1, 1, 1, 0, 0]


def test_mad_matches_numpy(spark):
    rng = np.random.default_rng(3)
    values = rng.standard_t(3, 301) * 10 + 50
    df = mad_scores(series_df(spark, values))
    got = df.orderBy("rn").select("z_mad").toPandas()["z_mad"].values
    med = np.median(values)
    sigma = 1.4826 * np.median(np.abs(values - med))
    exp = np.abs(values - med) / (sigma + 1e-9)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_global_zscore_ddof1(spark):
    values = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    df = global_zscore(series_df(spark, values))
    got = df.orderBy("rn").select("z_global").toPandas()["z_global"].values
    exp = (values - values.mean()) / (values.std(ddof=1) + 1e-9)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


@pytest.mark.parametrize("n,frac,train_n", [(10, 0.5, 5), (7, 0.5, 3), (9, 0.7, 6)])
def test_split_boundary(spark, n, frac, train_n):
    df = fractional_split(series_df(spark, range(n)), train_frac=frac, val_frac=None)
    got = [r.split for r in df.orderBy("rn").collect()]
    assert got.count("Train") == train_n
    assert got[:train_n] == ["Train"] * train_n


def test_fused_top_value_marker_matches_composed_ops(spark):
    """mark_top_value_windows == top_value_labels + mark_anomaly_windows
    on every row (the fused form is the zero-join pipeline fast path)."""
    from time_series_data_anomaly_detection_spark.operators.labeling import (
        mark_top_value_windows,
        top_value_labels,
    )

    rng = np.random.default_rng(7)
    df = series_df(spark, rng.normal(size=200).cumsum())
    labels = top_value_labels(df, 5)
    composed = {
        r.rn: r.is_anomaly
        for r in mark_anomaly_windows(df, labels, 3).collect()
    }
    fused = {
        r.rn: r.is_anomaly
        for r in mark_top_value_windows(df, 5, 3).collect()
    }
    assert fused == composed


def test_mad_scores_approx_path_close_to_exact(spark):
    """approx_accuracy switches the medians to a bounded-memory sketch
    (the 100 TB path); on a well-behaved distribution the scores must
    stay close to the exact ones."""
    import numpy as np
    from conftest import series_df
    from time_series_data_anomaly_detection_spark.operators.scaling import (
        mad_scores,
    )

    y = np.random.default_rng(4).normal(50, 5, 4000)
    exact = mad_scores(series_df(spark, y)).orderBy("rn").toPandas()
    approx = (
        mad_scores(series_df(spark, y), approx_accuracy=10000)
        .orderBy("rn")
        .toPandas()
    )
    err = np.abs(exact.z_mad - approx.z_mad).max()
    assert err < 0.05, err
