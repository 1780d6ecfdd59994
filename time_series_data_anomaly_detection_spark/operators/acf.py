"""Autocorrelation diagnostics (SURVEY §2.3 W8).

Reference: statsmodels ``plot_acf``/``plot_pacf`` over 50 lags (nb 01
cell 7).  Engine definition: ``acf(series, k)`` = Pearson correlation of
``(x_t, x_{t-k})`` pairs per series.

Spark-first shape: explode a literal lag grid against the frame, shift
with ``lag(value, k)`` per (series, lag) window, aggregate ``corr``.
One shuffle keyed by (series_id, lag); the lag grid multiplies rows
max_lag-fold but only through a projection — at scale, prefer the
per-series ``applyInPandas`` FFT variant once max_lag is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def acf(df: DataFrame, max_lag: int = 10, value_col: str = "value") -> DataFrame:
    """Per-series ACF for lags 1..max_lag: columns (series_id, lag, acf)."""
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    tall = df.select("series_id", "rn", value_col, lags)
    w = Window.partitionBy("series_id", "lag").orderBy("rn")
    # lag() needs a literal offset; emulate variable shift with a self-join
    shifted = tall.alias("a").join(
        df.select(
            "series_id", F.col("rn").alias("prn"), F.col(value_col).alias("prev")
        ).alias("b"),
        on=[
            F.col("a.series_id") == F.col("b.series_id"),
            F.col("a.rn") - F.col("a.lag") == F.col("b.prn"),
        ],
        how="inner",
    )
    return (
        shifted.groupBy(F.col("a.series_id").alias("series_id"), "lag")
        .agg(F.corr(F.col(f"a.{value_col}"), F.col("prev")).alias("acf"))
    )
