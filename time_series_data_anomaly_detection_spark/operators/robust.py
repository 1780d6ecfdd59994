"""Hampel filter — rolling-median / rolling-MAD robust outlier
detection, fully native (zero Python in the plan).

The robust counterpart of the reference's W1 adaptive threshold
(``src/utils.py:40-72``: rolling mean/std) and of its global MAD
scoring (``src/utils.py:31-38``): a centered ``2·half+1``-row window,
deviation from the WINDOW median, scaled by the WINDOW MAD with the
1.4826 Gaussian consistency constant the reference uses.

Spark-first shape: one window pass —
``array_sort(collect_list(value))`` over the centered row frame, exact
median by sorted-array indexing, MAD as the median of the in-frame
absolute deviations via a ``transform`` lambda over the same array.
No self-join, no UDF; the per-row cost is O(w log w) on a bounded
w ≤ 25-element array, and the only exchange is the series partition
every other window op reuses.  At 100 TB the axis is series count;
frame width is a constant.

Cross-engine exactness: sorted-array median indexing uses
``floor((n+1)/2.0)`` / ``floor(n/2.0)+1`` spelled identically in the
DuckDB oracle (Spark's double→int cast truncates while DuckDB's
rounds, so the floor form is load-bearing); the two middle elements
average as ``(lo+hi)/2.0`` which is exact when they coincide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAD_K = 1.4826  # src/utils.py:38 — shared with operators.scaling
EPS_SCALE = 1e-9


def _sorted_median(arr: Column, n: Column) -> Column:
    """Exact median of a sorted array column: average of the two
    middle elements (which coincide for odd n)."""
    lo = F.element_at(arr, F.floor((n + F.lit(1)) / F.lit(2.0)).cast("int"))
    hi = F.element_at(arr, (F.floor(n / F.lit(2.0)) + F.lit(1)).cast("int"))
    return (lo + hi) / F.lit(2.0)


def hampel_flags(
    df: DataFrame,
    value_col: str = "value",
    half: int = 12,
    nsig: float = 3.0,
) -> DataFrame:
    """Hampel identifier: flag rows where ``|x - med_w(x)| >
    nsig * (1.4826 * mad_w(x) + 1e-9)`` over the centered ±``half``
    row window (frame shrinks at series edges, the classical
    convention).

    Adds ``roll_med``, ``roll_mad``, ``hampel_flag``.
    """
    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = (
        Window.partitionBy("series_id")
        .orderBy(*(order or ["rn"]))
        .rowsBetween(-half, half)
    )
    v = F.col(value_col)
    arr = F.array_sort(F.collect_list(v).over(w))
    n = F.size(arr)
    med = _sorted_median(arr, n)
    out = df.withColumn("__arr", arr).withColumn("roll_med", med)
    dev_arr = F.array_sort(
        F.transform(F.col("__arr"), lambda x: F.abs(x - F.col("roll_med")))
    )
    mad = _sorted_median(dev_arr, F.size(dev_arr))
    out = out.withColumn("roll_mad", mad).drop("__arr")
    scale = F.lit(MAD_K) * F.col("roll_mad") + F.lit(EPS_SCALE)
    return out.withColumn(
        "hampel_flag",
        (F.abs(v - F.col("roll_med")) > F.lit(float(nsig)) * scale).cast(
            "int"
        ),
    )
