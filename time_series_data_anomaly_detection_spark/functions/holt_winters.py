"""Holt-Winters additive triple exponential smoothing with FIXED
smoothing parameters — the third hash-gated member of the state-space
family (after ``kalman_fixed`` and ``bsts_fixed``).

The reference covers the trend+seasonal forecasting niche with
statsmodels state-space fits (``src/bsts_model.py:12-50``) whose MLE
step forces rows-only gates.  Fixed-(α, β, γ) Holt-Winters captures
the same level/trend/seasonal structure as a pure scalar+vector
recursion, so the whole model carries a DuckDB RECURSIVE-CTE oracle —
the seasonal state rides through the recursion as a length-``p`` list
column (``list_append(sl[2:], s_new)`` is the rotation).

Bit-exactness recipe (see functions/control.py): dyadic smoothing
constants (α=1/4, β=1/16, γ=1/4), initial level from an exact
DECIMAL(38,12) sum of the first period computed SPARK-side and joined
in, update expression trees textually in lockstep with the oracle.

Init convention (documented, deliberately simple): ``l0 = mean(y[1..p])``,
``b0 = 0``, ``s_i = y_i - l0``; one-step-ahead predictions start at
``t = p+1``.  Series shorter than ``p+1`` rows emit nothing.

Scale shape: one tiny per-series aggregate + broadcast join, one
grouped-map pass, O(p) state per series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._exact import DEC
from ._partition import udf_repartition

HW_SCHEMA = (
    "series_id string, rn long, pred double, resid double"
)


def holt_winters_fixed(
    df: DataFrame,
    period: int = 48,
    alpha: float = 0.25,
    beta: float = 0.0625,
    gamma: float = 0.25,
    value_col: str = "value",
) -> DataFrame:
    """Additive Holt-Winters one-step-ahead forecast with fixed
    (α, β, γ)::

        pred_t = (l + b) + s_{t-p}
        l' = α(y_t - s_{t-p}) + (1-α)(l + b)
        b' = β(l' - l) + (1-β)b
        s' = γ(y_t - l') + (1-γ)s_{t-p}

    Returns ``series_id, rn, pred, resid`` for ``rn > period``.
    """
    p = int(period)
    a, bq, g = float(alpha), float(beta), float(gamma)
    ca, cb, cg = 1.0 - a, 1.0 - bq, 1.0 - g

    v = F.col(value_col)
    lvl0 = (
        df.filter(F.col("rn") <= p)
        .groupBy("series_id")
        .agg(
            F.count(value_col).alias("__np"),
            F.sum(v.cast(DEC)).cast("double").alias("__sp"),
        )
        .filter(F.col("__np") == p)
        .select(
            "series_id", (F.col("__sp") / F.lit(p)).alias("__l0")
        )
    )
    src = df.select("series_id", "rn", value_col).join(
        F.broadcast(lvl0), "series_id"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        if n <= p:
            return pd.DataFrame(
                {
                    "series_id": pd.Series(dtype=object),
                    "rn": pd.Series(dtype="int64"),
                    "pred": pd.Series(dtype=float),
                    "resid": pd.Series(dtype=float),
                }
            )
        l0 = float(pdf["__l0"].iloc[0])
        sl = list(y[:p] - l0)
        l, b = l0, 0.0
        preds = np.empty(n - p)
        for i, t in enumerate(range(p, n)):
            sprev = sl[0]
            preds[i] = (l + b) + sprev
            l_new = a * (y[t] - sprev) + ca * (l + b)
            b_new = bq * (l_new - l) + cb * b
            s_new = g * (y[t] - l_new) + cg * sprev
            sl = sl[1:] + [s_new]
            l, b = l_new, b_new
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[p:].to_numpy(),
                "rn": pdf["rn"].iloc[p:].to_numpy(),
                "pred": preds,
                "resid": y[p:] - preds,
            }
        )

    return (
        udf_repartition(src, "series_id")
        .groupBy("series_id")
        .applyInPandas(run, HW_SCHEMA)
    )


HOLT_SCHEMA = "series_id string, rn long, pred double, resid double"


def holt_linear_fixed(
    df: DataFrame,
    alpha: float = 0.25,
    beta: float = 0.0625,
    value_col: str = "value",
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing with FIXED
    (α, β) — the trend-only member between theta's SES and the
    seasonal Holt-Winters above::

        pred_t = l + b
        l' = α·y_t + (1-α)(l + b)
        b' = β(l' - l) + (1-β)b

    Init: ``l0 = y_1``, ``b0 = y_2 - y_1``; one-step-ahead predictions
    start at ``t = 3``.  Dyadic α=1/4, β=1/16 keep the recursion
    constants exact, so the grouped-map recursion and its DuckDB
    RECURSIVE-CTE oracle are in bit-lockstep (two scalars of state —
    the simplest recursion in the family).

    Returns ``series_id, rn, pred, resid`` for ``rn >= 3``.

    Scale shape: one grouped-map pass, O(1) state per series; no
    moment pre-aggregate needed (the init is positional).
    """
    a, bq = float(alpha), float(beta)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        n = len(y)
        if n < 3:
            return pd.DataFrame(
                {"series_id": [], "rn": [], "pred": [], "resid": []}
            )
        lvl = y[0]
        tr = y[1] - y[0]
        # consume y[2:] one step at a time: predict, then update
        preds = np.empty(n - 2)
        for i in range(2, n):
            # state entering step i reflects data through y[i-1]
            if i > 2:
                prev = lvl
                lvl = a * y[i - 1] + (1.0 - a) * (lvl + tr)
                tr = bq * (lvl - prev) + (1.0 - bq) * tr
            preds[i - 2] = lvl + tr
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[2:].to_numpy(),
                "rn": pdf["rn"].iloc[2:].to_numpy(),
                "pred": preds,
                "resid": y[2:] - preds,
            }
        )

    src = df.select("series_id", "rn", F.col(value_col).alias("value"))
    return udf_repartition(src, "series_id").groupBy("series_id").applyInPandas(
        run, HOLT_SCHEMA
    )
