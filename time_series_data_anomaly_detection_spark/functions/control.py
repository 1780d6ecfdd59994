"""EWMA and CUSUM control charts — the classical sequential detectors
that complete the changepoint family around BOCPD (SURVEY §2.3 W7).

The reference's only online detector is BOCPD
(``src/bocpd_model.py:50-104``), whose O(T²) posterior is genuinely
non-SQL and therefore rows-only in the gate.  EWMA and CUSUM cover the
same monitoring niche (drift / level-shift detection on a scored
stream) with *scalar* recursions, so — like ``kalman_fixed`` — they
carry DuckDB RECURSIVE-CTE oracles and are fully hash-gated.

Bit-exactness recipe (same as functions/kalman.py):

- per-series mean/std come from exact DECIMAL(38,12) sums computed
  SPARK-side (order/engine-independent, see ``_exact.py``) and ride
  into the recursion as per-group scalars;
- every recursion constant is a dyadic rational (λ = 0.25,
  (1-λ)² = 0.5625, k = 0.5, h = 5.0, L = 3.0) so literal parsing
  cannot introduce a 1-ulp seed difference;
- the update expression trees below are textually in lockstep with
  the oracle SQL in ``plans/registry.py`` — identical IEEE ops on
  identical inputs are identical.

Scale shape: one shuffle to the per-series moment aggregate (tiny,
broadcast back), one grouped-map pass per series.  The recursion is
O(n) per series with O(1) state; the parallelism axis is the series
count, exactly like every other sequential model here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._exact import DEC
from ._partition import udf_repartition

EPS_SD = 1e-9

EWMA_SCHEMA = (
    "series_id string, rn long, ewma double, ucl double, lcl double, "
    "flag int"
)

CUSUM_SCHEMA = (
    "series_id string, rn long, cusum_pos double, cusum_neg double, "
    "flag int"
)


def _with_moments(df: DataFrame, value_col: str) -> DataFrame:
    """Join per-series exact-decimal mean and sample std (ddof=1) as
    ``__mu`` / ``__sd`` — the same algebra as
    ``operators.scaling.global_zscore`` (hash-proven)."""
    v = F.col(value_col)
    moments = df.groupBy("series_id").agg(
        F.count(value_col).alias("__n"),
        F.sum(v.cast(DEC)).cast("double").alias("__s1"),
        F.sum((v * v).cast(DEC)).cast("double").alias("__s2"),
    )
    mu = (F.col("__s1") / F.col("__n")).alias("__mu")
    sd = F.sqrt(
        F.greatest(
            (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n"))
            / (F.col("__n") - 1),
            F.lit(0.0),
        )
    ).alias("__sd")
    m = moments.select("series_id", mu, sd)
    return df.join(F.broadcast(m), "series_id")


def ewma_chart(
    df: DataFrame,
    value_col: str = "value",
    lam: float = 0.25,
    nsig: float = 3.0,
) -> DataFrame:
    """EWMA control chart (Roberts 1959): ``z_t = z_{t-1} + λ(y_t -
    z_{t-1})`` seeded at the series mean, with the exact-variance
    control limits ``μ ± L·σ·sqrt(λ/(2-λ)·(1-(1-λ)^{2t}))``.

    ``λ`` must be dyadic (default 1/4) so the recursion constants are
    exact in binary and decimal; the ``(1-λ)^{2t}`` term is itself the
    recursion ``w_t = w_{t-1}·(1-λ)²`` so both engines round the same
    way once 9^t outgrows the mantissa.

    Returns ``series_id, rn, ewma, ucl, lcl, flag``.
    """
    lam = float(lam)
    w2 = (1.0 - lam) * (1.0 - lam)
    ratio = lam / (2.0 - lam)
    nsig = float(nsig)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        mu = float(pdf["__mu"].iloc[0])
        sd = float(pdf["__sd"].iloc[0])
        n = len(y)
        z = np.empty(n)
        hw = np.empty(n)
        zc, wc = mu, 1.0
        for t in range(n):
            zc = zc + lam * (y[t] - zc)
            wc = wc * w2
            z[t] = zc
            hw[t] = nsig * sd * np.sqrt(ratio * (1.0 - wc))
        ucl = mu + hw
        lcl = mu - hw
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"],
                "rn": pdf["rn"],
                "ewma": z,
                "ucl": ucl,
                "lcl": lcl,
                "flag": ((z > ucl) | (z < lcl)).astype("int32"),
            }
        )

    src = _with_moments(
        df.select("series_id", "rn", value_col), value_col
    )
    return (
        udf_repartition(src, "series_id")
        .groupBy("series_id")
        .applyInPandas(run, EWMA_SCHEMA)
    )


def cusum_chart(
    df: DataFrame,
    value_col: str = "value",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided tabular CUSUM (Page 1954) on the standardized series:
    ``z = (y - μ)/(σ + 1e-9)``; ``S⁺ = max(0, S⁺ + z - k)``,
    ``S⁻ = max(0, S⁻ - z - k)``; alarm when either sum exceeds ``h``.

    The hash-gated changepoint detector: same niche as BOCPD's
    ``cp_prob`` column but a scalar recursion, so the whole model is
    oracle-checkable.  ``k``/``h`` dyadic by default.

    Returns ``series_id, rn, cusum_pos, cusum_neg, flag``.
    """
    k = float(k)
    h = float(h)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        mu = float(pdf["__mu"].iloc[0])
        sd = float(pdf["__sd"].iloc[0])
        n = len(y)
        sp = np.empty(n)
        sn = np.empty(n)
        spc = snc = 0.0
        for t in range(n):
            z = (y[t] - mu) / (sd + EPS_SD)
            spc = max(0.0, spc + (z - k))
            snc = max(0.0, snc + (-z - k))
            sp[t] = spc
            sn[t] = snc
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"],
                "rn": pdf["rn"],
                "cusum_pos": sp,
                "cusum_neg": sn,
                "flag": ((sp > h) | (sn > h)).astype("int32"),
            }
        )

    src = _with_moments(
        df.select("series_id", "rn", value_col), value_col
    )
    return (
        udf_repartition(src, "series_id")
        .groupBy("series_id")
        .applyInPandas(run, CUSUM_SCHEMA)
    )


CUSUM_ALARM_SCHEMA = (
    "series_id string, rn long, direction string, stat double"
)


def cusum_alarms(
    df: DataFrame,
    value_col: str = "value",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """CUSUM changepoint LOCALIZATION: the two-sided chart with
    reset-on-alarm — each crossing empties its side's sum, so the
    output is the changepoint list itself (one row per alarm, the
    thing ``detect_changepoints`` consumers actually read off BOCPD's
    ``cp_prob`` column in ``src/changepoint.py:85-107``), not a dense
    flag column.

    Emits ``(series_id, rn, direction ∈ {'up','down'}, stat)`` at each
    crossing; the alarm count is O(changepoints), so the result table
    is tiny at any scale.  Same bit-exactness recipe as
    :func:`cusum_chart`; the reset is ``CASE alarm THEN 0`` spelled
    identically in the oracle recursion.
    """
    k = float(k)
    h = float(h)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(float)
        mu = float(pdf["__mu"].iloc[0])
        sd = float(pdf["__sd"].iloc[0])
        rows = []
        spc = snc = 0.0
        for t in range(len(y)):
            z = (y[t] - mu) / (sd + EPS_SD)
            spc = max(0.0, spc + (z - k))
            snc = max(0.0, snc + (-z - k))
            if spc > h:
                rows.append((pdf["series_id"].iloc[t],
                             int(pdf["rn"].iloc[t]), "up", spc))
                spc = 0.0
            if snc > h:
                rows.append((pdf["series_id"].iloc[t],
                             int(pdf["rn"].iloc[t]), "down", snc))
                snc = 0.0
        return pd.DataFrame(
            rows, columns=["series_id", "rn", "direction", "stat"]
        )

    src = _with_moments(
        df.select("series_id", "rn", value_col), value_col
    )
    return (
        udf_repartition(src, "series_id")
        .groupBy("series_id")
        .applyInPandas(run, CUSUM_ALARM_SCHEMA)
    )
