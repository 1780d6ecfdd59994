"""Monotonic-trend diagnostics: Mann-Kendall test + Theil-Sen slope.

The reference's notebooks eyeball trend in the decomposition panels
(``src/decomposition.py``; STL trend component) but publish no formal
trend decision.  This operator adds the standard nonparametric pair:

- **Mann-Kendall S**: ``S = sum_{i<j} sign(x_j - x_i)`` with the
  tie-corrected variance ``var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]
  / 18`` and the continuity-corrected normal score ``z`` (Mann 1945,
  Kendall 1975 — public formulas).
- **Theil-Sen slope**: the median of all pairwise slopes
  ``(x_j - x_i) / (j - i)`` — the robust trend-rate estimate.

Execution model: one ``applyInPandas`` per series.  The pair set is
O(n²) per series but never materialized as an n×n matrix — slopes are
accumulated lag-by-lag (``(x[d:] - x[:-d]) / d``), so peak extra memory
is one float64 array of n(n-1)/2 slopes (100 MB at n = 5 000).  At
100 TB the per-series length is the binding factor, not the series
count (each series is one task); for very long series the documented
recipe is the sampled-pair Sen estimator + blockwise S with the same
schema — the grouping/shuffle shape is unchanged.

Cross-engine determinism (hash gate): S, n, and the tie term are exact
integers; tau/z/slope use the same literal float algebra as the DuckDB
oracle (see ``plans/registry.py ORACLES['trend_test']``), and the
median is the explicit two-order-statistic average, which matches the
oracle's ``sum(slope)/count(*)`` over ranks ``(m+1)//2, (m+2)//2``
bit for bit (a+b then one exact scale by 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MK_SCHEMA = (
    "series_id string, n long, s_stat long, tau double, "
    "var_s double, z double, sen_slope double, trend string"
)


def _mann_kendall_one(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("rn")
    x = pdf["value"].to_numpy(dtype=np.float64)
    n = len(x)
    if n < 2:
        return pd.DataFrame(
            [[pdf["series_id"].iloc[0], n, 0, 0.0, 0.0, 0.0, 0.0, "no trend"]],
            columns=[
                "series_id", "n", "s_stat", "tau",
                "var_s", "z", "sen_slope", "trend",
            ],
        )

    m = n * (n - 1) // 2
    slopes = np.empty(m, dtype=np.float64)
    s_stat = 0
    pos = 0
    for d in range(1, n):
        diff = x[d:] - x[:-d]
        s_stat += int((diff > 0).sum()) - int((diff < 0).sum())
        k = n - d
        slopes[pos : pos + k] = diff / float(d)
        pos += k

    # tie-corrected variance (exact integer arithmetic up to /18)
    _, counts = np.unique(x, return_counts=True)
    tie_term = int(sum(int(t) * (t - 1) * (2 * t + 5) for t in counts if t > 1))
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0

    if s_stat > 0:
        z = (s_stat - 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    elif s_stat < 0:
        z = (s_stat + 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    else:
        z = 0.0
    tau = s_stat / (0.5 * n * (n - 1))

    # explicit two-order-statistic median: identical algebra to the
    # oracle's sum/count over ranks (m+1)//2 and (m+2)//2 (1-indexed)
    slopes.sort()
    k1 = (m + 1) // 2
    k2 = (m + 2) // 2
    if k1 == k2:
        sen = float(slopes[k1 - 1])
    else:
        sen = (float(slopes[k1 - 1]) + float(slopes[k2 - 1])) / 2.0

    trend = "increasing" if z > 1.96 else ("decreasing" if z < -1.96 else "no trend")
    return pd.DataFrame(
        [[pdf["series_id"].iloc[0], n, s_stat, tau, var_s, float(z), sen, trend]],
        columns=[
            "series_id", "n", "s_stat", "tau",
            "var_s", "z", "sen_slope", "trend",
        ],
    )


def mann_kendall_frame(df: DataFrame) -> DataFrame:
    """Per-series Mann-Kendall test + Theil-Sen slope.

    Input: ``(series_id, rn, value)``; output one row per series.
    """
    return (
        df.select("series_id", "rn", "value")
        .groupBy("series_id")
        .applyInPandas(_mann_kendall_one, MK_SCHEMA)
    )
