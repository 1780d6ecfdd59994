"""Extreme-value-theory threshold selection (peaks-over-threshold).

The reference picks anomaly thresholds as fixed multiples of a rolling
or global sigma (``src/utils.py:40-72``, ``src/run_hybrid.py:41-47``) —
a Gaussian assumption that under-alerts on heavy-tailed scores.  The
EVT alternative (Siffer et al., KDD 2017, "Anomaly Detection in Streams
with Extreme Value Theory" — the SPOT estimator family) fits a
Generalized Pareto Distribution to the excesses over a high empirical
quantile ``u`` and extrapolates the threshold ``z_q`` whose exceedance
probability is a target ``q`` far beyond the empirical range.

This implementation uses the METHOD-OF-MOMENTS GPD fit (closed form,
no iterative MLE): with ``m``/``v`` the population mean/variance of the
excesses ``x - u`` (x > u),

    xi   = (1 - m^2 / v) / 2
    beta = m * (m^2 / v + 1) / 2
    z_q  = u + beta/xi * ((q*n/n_tail)^(-xi) - 1)      (xi != 0)
    z_q  = u - m * ln(q*n/n_tail)                      (exponential tail)

Everything is aggregate algebra: one exact-percentile aggregate for
``u``, one decimal-summed aggregate over the tail, one closed-form
projection, one counting pass — fully SQL-expressible, hence
hash-gated against the DuckDB oracle.  Scale shape: two grouped
aggregates plus broadcast joins of the per-series one-row frames; the
exact percentile swaps to ``approx_percentile`` at 100 TB (same knob
as ``mad_scores``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._exact import dsum

XI_EPS = 1e-9


def pot_threshold(
    df: DataFrame,
    score_col: str = "value",
    q_level: float = 0.98,
    target_p: float = 1e-3,
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per-series POT/GPD threshold frame.

    Returns one row per series: tail size, empirical quantile ``u``,
    MoM GPD parameters ``(xi, beta)``, the extrapolated threshold
    ``z_q`` for exceedance probability ``target_p``, and how many
    observed points sit above it.
    """
    v = F.col(score_col)
    if approx_accuracy is not None:
        u_agg = F.percentile_approx(v, F.lit(q_level), F.lit(int(approx_accuracy)))
    else:
        u_agg = F.percentile(v, F.lit(q_level))
    base = df.groupBy("series_id").agg(
        F.count(score_col).alias("n"), u_agg.alias("u")
    )
    tail = (
        df.join(F.broadcast(base), "series_id")
        .filter(v > F.col("u"))
        .groupBy("series_id")
        .agg(
            F.count("*").alias("n_tail"),
            dsum(v - F.col("u")).alias("__s1"),
            dsum((v - F.col("u")) * (v - F.col("u"))).alias("__s2"),
        )
    )
    # LEFT join: a series whose tail is empty (constant values, or
    # heavy ties putting the q_level quantile at the max) must still
    # appear in the output — as a degenerate row (n_tail=0, xi=0,
    # beta=0, z_q=u) — or downstream flag queries silently emit zero
    # rows for it.  The DuckDB oracle mirrors the same convention.
    j = base.join(tail, "series_id", "left").withColumn(
        "n_tail", F.coalesce("n_tail", F.lit(0).cast("long"))
    )
    empty_tail = F.col("n_tail") == 0
    m = F.col("__s1") / F.col("n_tail")
    var = (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("n_tail")) / F.col(
        "n_tail"
    )
    r = m * m / var  # m^2/v: > 1 for xi < 0, < 1 for xi > 0
    xi = (F.lit(1.0) - r) / F.lit(2.0)
    beta = m * (r + F.lit(1.0)) / F.lit(2.0)
    # exceedance ratio the extrapolation inverts: q * n / n_tail
    ratio = F.lit(target_p) * F.col("n") / F.col("n_tail")
    z_gpd = F.col("u") + beta / xi * (F.pow(ratio, -xi) - F.lit(1.0))
    z_exp = F.col("u") - m * F.log(ratio)
    # degenerate tails (all excesses equal -> v = 0) and xi ~ 0 both
    # take the exponential-tail limit
    z_q = F.when(empty_tail, F.col("u")).otherwise(
        F.when((var > 0) & (F.abs(xi) > XI_EPS), z_gpd).otherwise(z_exp)
    )
    params = j.select(
        "series_id",
        "n",
        "n_tail",
        "u",
        F.when(empty_tail | ~(var > 0), F.lit(0.0)).otherwise(xi).alias("xi"),
        F.when(empty_tail, F.lit(0.0))
        .otherwise(F.when(var > 0, beta).otherwise(m))
        .alias("beta"),
        z_q.alias("z_q"),
    )
    above = (
        df.join(F.broadcast(params.select("series_id", "z_q")), "series_id")
        .filter(v > F.col("z_q"))
        .groupBy("series_id")
        .agg(F.count("*").cast("long").alias("n_above"))
    )
    return (
        params.join(above, "series_id", "left")
        .withColumn("n_above", F.coalesce("n_above", F.lit(0).cast("long")))
    )
