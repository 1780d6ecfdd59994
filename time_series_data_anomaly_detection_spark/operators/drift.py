"""Page-Hinkley drift detection — fully native (zero Python, zero
recursion in the plan).

Completes the sequential-change family around BOCPD
(``src/bocpd_model.py:50-104``, rows-only) and the CUSUM/EWMA charts
(``functions/control.py``, recursive-CTE oracles): Page-Hinkley (Page
1954; the streaming-drift formulation of Gama et al. 2014) monitors
the cumulative deviation of the series from its mean and alarms when
it exceeds the running extremum by more than ``λ``.

The key algebraic move that makes this NATIVE where CUSUM needed a
recursion: PH's statistic has a closed prefix form.  With
``m_t = Σ_{i≤t}(x_i − μ − δ)``, the test is ``m_t − min_{i≤t} m_i >
λ`` — a cumulative sum plus a running minimum, both single-pass
window functions on ONE series exchange.  (CUSUM's ``max(0, ·)``
clamp inside the recursion is what breaks its prefix form.)

Cross-engine exactness: the prefix sum runs in DECIMAL(38,12) (order
independent, bit-exact — the house pattern from ``_exact.py``); the
per-row statistic ``S_t − rn·(μ+δ)`` is then a fixed expression over
identical doubles; the running min/max of identical doubles is
identical.  ``δ = σ/8`` and ``λ = 20σ`` keep the tuning constants
dyadic multiples of the exact-moment σ.

Scale shape: one shuffle to the per-series moment aggregate (tiny,
broadcast back) + the single series-partition sort every window
operator shares.  O(n) work, O(1) state per row; the 100 TB axis is
series count, and the statistic is restartable from ``(S_t, min, max)``
checkpoints because it is a pure prefix computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC

EPS_SD = 1e-9


def page_hinkley(
    df: DataFrame,
    value_col: str = "value",
    delta_frac: float = 0.125,
    lam_frac: float = 20.0,
) -> DataFrame:
    """Two-sided Page-Hinkley test over a many-series frame.

    Adds ``ph_up`` (upward-drift statistic ``m_t − min m``), ``ph_dn``
    (downward ``max m' − m'_t``), and ``flag_up`` / ``flag_dn``
    (statistic ``> λ``), with ``δ = delta_frac·σ``, ``λ = lam_frac·σ``
    from the exact-decimal per-series moments.

    Expects ``series_id, rn, value`` (+ ``timestamp, event_id`` for
    deterministic ordering).
    """
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

    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = (
        Window.partitionBy("series_id")
        .orderBy(*(order or ["rn"]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    out = df.join(F.broadcast(m), "series_id")
    delta = F.col("__sd") * F.lit(float(delta_frac))
    lam = F.col("__sd") * F.lit(float(lam_frac))
    s_t = F.sum(v.cast(DEC)).over(w).cast("double")
    out = out.withColumn(
        "__m_up", s_t - F.col("rn") * (F.col("__mu") + delta)
    ).withColumn("__m_dn", s_t - F.col("rn") * (F.col("__mu") - delta))
    out = (
        out.withColumn("ph_up", F.col("__m_up") - F.min("__m_up").over(w))
        .withColumn("ph_dn", F.max("__m_dn").over(w) - F.col("__m_dn"))
        .withColumn("flag_up", (F.col("ph_up") > lam).cast("int"))
        .withColumn("flag_dn", (F.col("ph_dn") > lam).cast("int"))
    )
    return out.drop("__n", "__s1", "__s2", "__mu", "__sd", "__m_up", "__m_dn")
