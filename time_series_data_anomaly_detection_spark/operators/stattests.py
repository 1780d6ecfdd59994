"""Distributional / dependence statistical tests, fully native.

Completes the test family around Mann-Kendall/Theil-Sen
(``operators/trend.py``): the reference eyeballs random-walk-vs-mean-
reversion structure through ACF plots (``notebooks/01`` ACF/PACF
cells, ``src/plotting.py``); the variance-ratio test (Lo & MacKinlay
1988) is the standard FORMAL test for it, and it is pure moment
algebra — exactly the shape a SQL engine executes well.

``VR(q) = Var(x_t − x_{t−q}) / (q · Var(x_t − x_{t−1}))`` computed
over overlapping q-period differences; 1 for a random walk, < 1 for
mean reversion, > 1 for trending/momentum.  The asymptotic z-statistic
``(VR − 1)/sqrt(2(2q−1)(q−1)/(3qn))`` uses only rational arithmetic
plus one sqrt — identical IEEE on both engines.

Cross-engine exactness: both difference columns are exact lags of the
raw values; all variance sums run in DECIMAL(38,12) (order
independent); every downstream expression is a fixed tree over
identical doubles.

Scale shape: one series-partition window pass producing the q+1 lag
columns, one per-series aggregate (tiny, q rows per series).  O(n)
work; 100 TB axis is series count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC


def variance_ratio(
    df: DataFrame,
    value_col: str = "value",
    qs: tuple[int, ...] = (2, 4, 8),
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test at horizons ``qs``.

    Returns one row per (series_id, q): ``n`` (count of 1-period
    diffs), ``var1``, ``varq`` (sample variances, ddof=1), ``vr``,
    and the asymptotic ``z`` statistic.
    """
    v = F.col(value_col)
    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = Window.partitionBy("series_id").orderBy(*(order or ["rn"]))

    d1 = (v - F.lag(v, 1).over(w)).alias("__d1")
    base = df.select(
        "series_id",
        d1,
        *[(v - F.lag(v, q).over(w)).alias(f"__d{q}") for q in qs],
    )

    def _var(col: str, n: F.Column) -> F.Column:
        c = F.col(col)
        s1 = F.sum(c.cast(DEC)).cast("double")
        s2 = F.sum((c * c).cast(DEC)).cast("double")
        return (s2 - s1 * s1 / n) / (n - 1)

    # ONE aggregate computes every horizon's moments (single shuffle,
    # single window evaluation), then an explode unpivots to rows
    agg = base.groupBy("series_id").agg(
        F.count("__d1").alias("n"),
        _var("__d1", F.count("__d1")).alias("var1"),
        *[
            _var(f"__d{q}", F.count(f"__d{q}")).alias(f"varq_{q}")
            for q in qs
        ],
    )
    rows = agg.select(
        "series_id",
        "n",
        "var1",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.col(f"varq_{q}").alias("varq"),
                    )
                    for q in qs
                ]
            )
        ).alias("qe"),
    ).select("series_id", "n", "var1", "qe.q", "qe.varq")
    vr = F.col("varq") / (F.col("q") * F.col("var1"))
    z = (vr - F.lit(1.0)) / F.sqrt(
        (2.0 * (2.0 * F.col("q") - 1.0) * (F.col("q") - 1.0))
        / (3.0 * F.col("q") * F.col("n"))
    )
    return rows.select(
        "series_id", "q", "n", "var1", "varq",
        vr.alias("vr"), z.alias("z"),
    )
