"""Forecast feature-table construction — the feature-engineering step
between the raw series and any learned forecaster.

The reference hand-builds its model inputs inline: LSTM sliding
windows (``src/lstm_model.py:18-30``), positional split fractions
(``src/kalman_model.py:168-171``), STL residual channels
(``src/run_lstm.py:36-39``).  ``feature_table`` is the engine-level
generalization: one native pass that emits the standard tabular-model
regressors — short lags, the seasonal lag, trailing mean/std
(reusing the W1 rolling engine), calendar one-hot keys (hour,
day-of-week), and the positional fraction used for splits — so a
downstream GBM/linear forecaster trains straight off the table.

Everything is native (lags + the exact-decimal rolling sums + date
parts); the only exchange is the series window every sequential
operator shares.  At 100 TB the axis is series count × rows, and the
output is a pure projection — no new shuffle beyond the shared sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rolling import rolling_stats


def feature_table(
    df: DataFrame,
    value_col: str = "value",
    lags: tuple[int, ...] = (1, 2, 3),
    seasonal_lag: int = 48,
    window: int = 48,
) -> DataFrame:
    """Per-row forecast features: ``lag_k`` columns, ``lag_s``
    (seasonal), ``roll_mean``/``roll_std`` (trailing ``window``,
    min_periods=5, head-bfilled — the W1 engine), ``hod``/``dow``
    calendar keys, and ``pos_frac`` = rn/n (the reference's split
    coordinate).  Rows whose longest lag is not yet available carry
    nulls (the model-side mask, P13 semantics).
    """
    v = F.col(value_col)
    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = Window.partitionBy("series_id").orderBy(*(order or ["rn"]))

    out = rolling_stats(df, value_col=value_col, window=window)
    for k in lags:
        out = out.withColumn(f"lag_{k}", F.lag(v, k).over(w))
    out = out.withColumn(f"lag_s{seasonal_lag}", F.lag(v, seasonal_lag).over(w))
    n = F.count("*").over(Window.partitionBy("series_id"))
    return (
        out.withColumn("hod", F.hour("timestamp").cast("int"))
        .withColumn("dow", (F.dayofweek("timestamp") - 1).cast("int"))
        .withColumn("pos_frac", F.col("rn") / n)
    )
