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

from .._exact import DEC


def acf(df: DataFrame, max_lag: int = 10, value_col: str = "value") -> DataFrame:
    """Per-series ACF for lags 1..max_lag: columns (series_id, lag, acf).

    Pearson r from exact decimal sums (sx, sy, sxx, syy, sxy) instead
    of ``F.corr`` — corr's streaming co-moments are summation-order-
    dependent; the explicit form is order/engine-independent and
    mirrors the oracle bit for bit (see ``_exact.py``).
    """
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    tall = df.select("series_id", "rn", value_col, lags)
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
    x = F.col(f"a.{value_col}")
    y = F.col("prev")
    agg = shifted.groupBy(F.col("a.series_id").alias("series_id"), "lag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum((y * y).cast(DEC)).cast("double").alias("syy"),
        F.sum((x * y).cast(DEC)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt((n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy))
    return agg.select("series_id", "lag", (num / den).alias("acf"))


def pacf(df: DataFrame, max_lag: int = 10, value_col: str = "value") -> DataFrame:
    """Per-series PACF for lags 1..max_lag via Durbin–Levinson on the
    ACF sequence (statsmodels ``plot_pacf`` companion, nb 01 cell 7).

    The recursion is sequential in lag but runs on the TINY per-series
    ACF table (max_lag rows/series), so it rides a grouped-map UDF
    over the aggregate, not the raw points — the heavy lifting stays
    in the native ACF aggregation.
    """
    import pandas as pd

    rho = acf(df, max_lag, value_col)

    def dl(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lag").reset_index(drop=True)
        r = pdf["acf"].to_numpy(float)
        m = len(r)
        phi_prev: list[float] = []
        out = []
        for k in range(1, m + 1):
            if k == 1:
                phi_kk = r[0]
                phi = [phi_kk]
            else:
                num = r[k - 1] - sum(
                    phi_prev[j] * r[k - 2 - j] for j in range(k - 1)
                )
                den = 1.0 - sum(phi_prev[j] * r[j] for j in range(k - 1))
                phi_kk = num / den if abs(den) > 1e-12 else 0.0
                phi = [
                    phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
                    for j in range(k - 1)
                ] + [phi_kk]
            out.append((pdf["series_id"].iloc[0], k, float(phi_kk)))
            phi_prev = phi
        return pd.DataFrame(out, columns=["series_id", "lag", "pacf"])

    return rho.groupBy("series_id").applyInPandas(
        dl, "series_id string, lag int, pacf double"
    )
