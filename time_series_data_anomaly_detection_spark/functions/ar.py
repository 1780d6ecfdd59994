"""Autoregressive forecaster — the deterministic stand-in for the
reference's LSTM (SURVEY §2.9 M5).

The reference trains a tiny torch LSTM per series on sliding windows
(``src/lstm_model.py:32-91``).  torch is not available in this
environment; the engine provides:

- ``ar_forecast`` — AR(p) via least squares on lagged features, fully
  deterministic.  AR(1) is also expressible in closed form
  (regr_slope/intercept), which gives the model family a DuckDB oracle.
- a torch-gated LSTM (``lstm.py``) that activates when torch exists.

Spark shape: for AR(1) the ENTIRE model is native SQL algebra (fit =
one aggregate of covariances, predict = column arithmetic) — no UDF,
no per-series loop, scales to any series count in two shuffles.  For
p>1, a numpy lstsq inside ``applyInPandas``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ar1_forecast_native(df: DataFrame, value_col: str = "value") -> DataFrame:
    """AR(1) with intercept, fit per series with native aggregates.

    pred[t] = intercept + slope * x[t-1]  (null at the series head).
    slope/intercept are the OLS estimates over all (x[t-1], x[t])
    pairs — ``regr_slope``/``regr_intercept`` semantics, computed from
    exact decimal sums (slope = (n·Σxy − ΣxΣy)/(n·Σxx − Σx²),
    icept = (Σy − slope·Σx)/n) so they are order/engine-independent and
    bit-match the oracle's identical algebra (see ``_exact.py``).
    """
    from .._exact import DEC

    w = Window.partitionBy("series_id").orderBy("rn")
    lagged = df.withColumn("__prev", F.lag(value_col).over(w))
    x, y = F.col("__prev"), F.col(value_col)
    sums = (
        lagged.filter(x.isNotNull())
        .groupBy("series_id")
        .agg(
            F.count("*").alias("__n"),
            F.sum(x.cast(DEC)).cast("double").alias("__sx"),
            F.sum(y.cast(DEC)).cast("double").alias("__sy"),
            F.sum((x * x).cast(DEC)).cast("double").alias("__sxx"),
            F.sum((y * x).cast(DEC)).cast("double").alias("__sxy"),
        )
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    slope = (n * F.col("__sxy") - sx * sy) / (n * F.col("__sxx") - sx * sx)
    fit = sums.withColumn("__slope", slope).withColumn(
        "__icept", (sy - F.col("__slope") * sx) / n
    )
    return (
        lagged.join(F.broadcast(fit), "series_id")
        .withColumn("pred_mean", F.col("__icept") + F.col("__slope") * F.col("__prev"))
        .withColumn("resid", F.col(value_col) - F.col("pred_mean"))
        .drop("__prev", "__slope", "__icept", "__n", "__sx", "__sy", "__sxx", "__sxy")
    )


AR_SCHEMA = (
    "series_id string, timestamp timestamp, value double, rn long, "
    "pred_mean double, resid double"
)


def ar_forecast(
    df: DataFrame,
    p: int = 24,
    train_frac: float = 1.0,
    frac_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """AR(p) via numpy lstsq per series (one-step-ahead, in-sample on
    train, recursive-free direct prediction on the tail using actual
    lags — the LSTM-predict analogue of sliding-window inference).

    ``score_col`` additionally emits the MAD z-score of the residuals
    (exact ``mad_scores`` math) computed inside the same pass — zero
    extra stages versus 4 aggregate/join waves for the operator form.

    ``frac_col`` fuses many train fractions into ONE grouped-map pass:
    the input carries a per-row fraction column (e.g. exploded
    walk-forward fold boundaries) and fitting groups on
    ``(series_id, frac_col)`` — one shuffle for all folds instead of
    one full fit DAG per fold.
    """

    out_cols = ["series_id", "timestamp", "value", "rn", "pred_mean", "resid"]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        tf = float(pdf[frac_col].iloc[0]) if frac_col else train_frac
        y = pdf["value"].to_numpy(float)
        n = len(y)
        pp = min(p, max(n // 4, 1))
        n_train = max(int(n * tf), pp + 2)
        X = np.column_stack(
            [np.ones(n - pp)] + [y[pp - k - 1 : n - k - 1] for k in range(pp)]
        )
        X_tr = X[: max(n_train - pp, 1)]
        y_tr = y[pp:n_train]
        coef, *_ = np.linalg.lstsq(X_tr, y_tr[: len(X_tr)], rcond=None)
        pred = np.full(n, np.nan)
        pred[pp:] = X @ coef
        pdf["pred_mean"] = pred
        pdf["resid"] = y - pred
        cols = out_cols + ([frac_col] if frac_col else [])
        if score_col:
            from ._score import mad_z

            pdf[score_col] = mad_z(pdf["resid"].to_numpy(float))
            cols = cols + [score_col]
        return pdf[cols]

    from ._partition import udf_repartition

    keys = ("series_id", frac_col) if frac_col else ("series_id",)
    schema = AR_SCHEMA + (f", {frac_col} double" if frac_col else "")
    if score_col:
        schema += f", {score_col} double"
    sel = list(out_cols[:4]) + ([frac_col] if frac_col else [])
    return (
        udf_repartition(df.select(*sel), *keys)
        .groupBy(*keys)
        .applyInPandas(fit, schema)
    )
