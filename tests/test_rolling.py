"""W1 rolling semantics vs pandas (the reference's engine):
rolling(window, min_periods).std()/.mean() + bfill + eps flag
(src/utils.py:40-72)."""

import numpy as np
import pandas as pd

from conftest import series_df
from time_series_data_anomaly_detection_spark.operators import (
    adaptive_threshold_flags,
    rolling_stats,
)


def pandas_reference(values, window=48, min_periods=5, k=3.0):
    s = pd.Series(values)
    rolling = s.rolling(window=window, min_periods=min_periods)
    sigma = rolling.std().bfill()
    mean = rolling.mean().bfill()
    flags = (np.abs(values - mean) > k * (sigma + 1e-6)).astype(int)
    return mean.values, sigma.values, flags.values


def test_rolling_matches_pandas(spark):
    rng = np.random.default_rng(7)
    values = rng.normal(100, 10, 200)
    values[50] = 300.0  # a spike
    df = rolling_stats(series_df(spark, values), window=48, min_periods=5)
    got = df.orderBy("rn").select("roll_mean", "roll_std").toPandas()
    exp_mean, exp_std, _ = pandas_reference(values)
    np.testing.assert_allclose(got["roll_mean"], exp_mean, rtol=1e-9)
    np.testing.assert_allclose(got["roll_std"], exp_std, rtol=1e-9)


def test_adaptive_flags_match_pandas(spark):
    rng = np.random.default_rng(11)
    values = rng.normal(0, 1, 150)
    values[60:63] = 8.0
    df = adaptive_threshold_flags(series_df(spark, values), k=3.0)
    got = [r.flag for r in df.orderBy("rn").collect()]
    _, _, exp = pandas_reference(values)
    assert got == list(exp)


def test_min_periods_bfill_head(spark):
    # first min_periods-1 rows must be backfilled with the first defined value
    values = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    df = rolling_stats(series_df(spark, values), window=48, min_periods=5)
    rows = df.orderBy("rn").select("roll_std").collect()
    first_defined = rows[4].roll_std
    for r in rows[:4]:
        assert r.roll_std == first_defined


def test_short_series_all_null_then_bfill_empty(spark):
    # fewer rows than min_periods: everything stays null (nothing to bfill)
    df = rolling_stats(series_df(spark, [1.0, 2.0, 3.0]), window=48, min_periods=5)
    assert all(r.roll_std is None for r in df.collect())


def test_fill_gaps_interpolates_missing_buckets(spark):
    """fill_gaps: absent buckets materialize with is_gap=1 and linear
    interpolation between the nearest known values; observed rows pass
    through untouched."""
    import pandas as pd

    from time_series_data_anomaly_detection_spark.operators.decompose import (
        fill_gaps,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "series_id": "a",
            # hourly grid with buckets 1, 2 and 4 missing
            "timestamp": [base, base + pd.Timedelta(hours=3),
                          base + pd.Timedelta(hours=5)],
            "value": [0.0, 9.0, 5.0],
        }
    )
    out = (
        fill_gaps(spark.createDataFrame(pdf), 3600)
        .toPandas()
        .sort_values("ts_s")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    assert out["is_gap"].tolist() == [0, 1, 1, 0, 1, 0]
    assert out["value"].tolist() == [0.0, 3.0, 6.0, 9.0, 7.0, 5.0]
