"""Seasonal decomposition, Spark-native (SURVEY §2.9 M1 analogue).

The reference decomposes with statsmodels STL (``src/utils.py:5-29``,
robust Loess).  statsmodels is not available here, and more importantly
STL's Loess is inherently sequential per series.  Engine approach:

1. ``classical_decompose`` — the classical moving-average decomposition
   (trend = centered 2×m MA, seasonal = phase means of the detrended
   series, resid = value - trend - seasonal) expressed ENTIRELY in
   native window/groupBy algebra: zero Python, whole-stage codegen,
   exactly SQL-oracle-checkable.
2. ``functions.stl.stl_decompose`` — a numpy Loess-based STL inside
   ``applyInPandas`` for parity with the reference's robust variant
   (one series per group, fanned out across executors).

``resample`` regularizes an irregular event stream onto a fixed grid
(time-bucket average) — the reference assumes NAB's regular grid, so
resampling is the bridge from raw event data to every grid-based
operator.  It is a single groupBy; at scale it is the canonical
pre-aggregation that shrinks 100 TB of events to a grid frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC


def resample(
    df: DataFrame,
    every: str = "hour",
    value_col: str = "value",
    agg: str = "avg",
) -> DataFrame:
    """Bucket an event stream to a regular grid: one row per
    (series_id, date_trunc(every, timestamp)) with the aggregated value.

    Gaps (empty buckets) are preserved as absent rows; grid-based
    operators tolerate them because ordering is positional per series.
    ``avg``/``sum`` accumulate through exact decimals so the grid values
    are order/engine-independent (see ``_exact.py``).
    """
    c = F.col(value_col)
    agg_fn = {
        "avg": lambda _: F.sum(c.cast(DEC)).cast("double") / F.count(value_col),
        "sum": lambda _: F.sum(c.cast(DEC)).cast("double"),
        "max": F.max,
        "min": F.min,
        "count": lambda col: F.count(col).cast("double"),
    }[agg]
    return (
        df.groupBy("series_id", F.date_trunc(every, "timestamp").alias("timestamp"))
        .agg(agg_fn(value_col).alias(value_col))
    )


def fill_gaps(
    df: DataFrame,
    step_seconds: int = 3600,
    value_col: str = "value",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Complete a per-series resampled grid: materialize every missing
    bucket between each series' first and last observation and
    linearly interpolate its value between the nearest known
    neighbors (endpoint fallback: nearest known value).

    ``resample`` leaves empty buckets ABSENT; positional operators
    tolerate that, but phase-based ones (seasonal decomposition,
    calendar joins) and any fixed-step model need the explicit grid.
    Input is expected on the bucket grid (i.e. ``resample`` output).

    Scale shape: per-series bounds are one tiny aggregate (broadcast
    back); the grid explode produces exactly the output rows; the
    value lookup is an equi-join on (series_id, ts_s); the
    prev/next neighbor scan is two ``last(ignorenulls)`` running
    windows over ONE series exchange — never a
    ``currentRow → unboundedFollowing`` frame, which Spark evaluates
    O(n²) (the backward pass is a running window over descending
    order instead).

    Output: ``series_id, ts_s`` (epoch seconds), ``is_gap`` (1 for
    materialized rows), ``value`` (observed or interpolated).
    """
    d = df.select(
        "series_id",
        F.unix_timestamp(ts_col).alias("ts_s"),
        F.col(value_col).alias("__v"),
    )
    bounds = d.groupBy("series_id").agg(
        F.min("ts_s").alias("__lo"), F.max("ts_s").alias("__hi")
    )
    grid = bounds.select(
        "series_id",
        F.explode(
            F.sequence("__lo", "__hi", F.lit(int(step_seconds)))
        ).alias("ts_s"),
    )
    j = grid.join(d, ["series_id", "ts_s"], "left")
    asc = (
        Window.partitionBy("series_id")
        .orderBy("ts_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    desc = (
        Window.partitionBy("series_id")
        .orderBy(F.desc("ts_s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    known_ts = F.when(F.col("__v").isNotNull(), F.col("ts_s"))
    # ONE select: the two same-spec window columns collapse into a
    # single Window node per direction (a withColumn chain interposes
    # Projects that block CollapseWindow → 4 nodes instead of 2)
    j = j.select(
        "*",
        F.last("__v", ignorenulls=True).over(asc).alias("__pv"),
        F.last(known_ts, ignorenulls=True).over(asc).alias("__pt"),
        F.last("__v", ignorenulls=True).over(desc).alias("__nv"),
        F.last(known_ts, ignorenulls=True).over(desc).alias("__nt"),
    )
    interp = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(
            F.col("__pv").isNotNull() & F.col("__nv").isNotNull(),
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (
                (F.col("ts_s") - F.col("__pt"))
                / (F.col("__nt") - F.col("__pt"))
            ),
        )
        .otherwise(F.coalesce("__pv", "__nv"))
    )
    return j.select(
        "series_id",
        "ts_s",
        F.col("__v").isNull().cast("int").alias("is_gap"),
        interp.alias(value_col),
    )


def classical_decompose(
    df: DataFrame,
    period: int = 24,
    value_col: str = "value",
    phase_expr=None,
) -> DataFrame:
    """Classical additive decomposition on a regular per-series grid.

    trend: centered 2×m moving average for even m —
    ``(0.5·x[t-m/2] + Σ x[t-m/2+1..t+m/2-1] + 0.5·x[t+m/2]) / m``,
    computed as the average of two offset window sums (no UDF).  Null
    within m/2 rows of either series edge (same as statsmodels
    ``seasonal_decompose``).

    seasonal: mean of (value - trend) per phase (default: hour-of-day
    for period=24), centered to zero mean per series.

    resid: value - trend - seasonal (null where trend is null).
    """
    half = period // 2
    w = Window.partitionBy("series_id").orderBy("timestamp")
    v = F.col(value_col)
    if period % 2 == 0:
        w_a = w.rowsBetween(-half, half - 1)
        w_b = w.rowsBetween(-half + 1, half)
        trend = (
            F.sum(v.cast(DEC)).over(w_a).cast("double")
            + F.sum(v.cast(DEC)).over(w_b).cast("double")
        ) / F.lit(2.0 * period)
        full = F.count(value_col).over(w.rowsBetween(-half, half)) == (period + 1)
    else:
        w_c = w.rowsBetween(-half, half)
        trend = F.sum(v.cast(DEC)).over(w_c).cast("double") / F.count(
            value_col
        ).over(w_c)
        full = F.count(value_col).over(w_c) == period
    out = df.withColumn("trend", F.when(full, trend))
    phase = phase_expr if phase_expr is not None else F.hour("timestamp")
    out = out.withColumn("__phase", phase).withColumn(
        "__detr", F.col(value_col) - F.col("trend")
    )
    wp = Window.partitionBy("series_id", "__phase")
    seasonal_raw = F.sum(F.col("__detr").cast(DEC)).over(wp).cast(
        "double"
    ) / F.count("__detr").over(wp)
    out = out.withColumn("__sraw", seasonal_raw)
    # center: subtract the mean of the per-phase means (not the global
    # mean of __sraw, which would weight phases by row count); exact
    # decimal sums at every level (see _exact.py)
    phase_means = (
        out.groupBy("series_id", "__phase")
        .agg(
            (
                F.sum(F.col("__detr").cast(DEC)).cast("double")
                / F.count("__detr")
            ).alias("__pm")
        )
        .groupBy("series_id")
        .agg(
            (
                F.sum(F.col("__pm").cast(DEC)).cast("double") / F.count("__pm")
            ).alias("__pm_mean")
        )
    )
    out = (
        out.join(F.broadcast(phase_means), "series_id")
        .withColumn("seasonal", F.col("__sraw") - F.col("__pm_mean"))
        .withColumn("resid", F.col(value_col) - F.col("trend") - F.col("seasonal"))
        .drop("__phase", "__detr", "__sraw", "__pm_mean")
    )
    return out


def stl_forecast(
    dc: DataFrame,
    horizon: int = 24,
    value_col: str = "value",
) -> DataFrame:
    """Decompose-based seasonal forecast: extrapolate the classical
    trend by its end-to-end drift and repeat the per-phase seasonal —
    the forecasting READ of :func:`classical_decompose` (the same
    composition the reference's decompose-then-model pipelines imply,
    ``src/run_lstm.py:36-39``), and the seasonal upgrade of the
    ``drift`` baseline in ``baseline_forecasts``.

    Input: a decomposed grid frame (``classical_decompose`` output:
    series_id, timestamp, value, trend, seasonal).  For each series::

        slope    = (trend_last − trend_first) / (brn_last − brn_first)
        pred_k   = trend_last + (steps_k)·slope + seasonal(phase_k)

    anchored at the LAST DEFINED trend bucket; ``steps_k`` counts grid
    rows from that anchor to forecast step k.

    Returns ``series_id, step (1..horizon), bucket, trend_fc,
    seasonal, pred`` — one row per future bucket.

    Scale shape: two tiny per-series aggregates (anchor stats,
    per-phase seasonal) + an explode of ``horizon`` rows per series;
    everything after the decompose is broadcast-sized.
    """
    w = Window.partitionBy("series_id").orderBy("timestamp")
    g = dc.withColumn("__brn", F.row_number().over(w)).withColumn(
        "__phase", F.hour("timestamp").cast("int")
    )
    anchors = g.groupBy("series_id").agg(
        F.min(
            F.when(F.col("trend").isNotNull(), F.col("__brn"))
        ).alias("__brn0"),
        F.max(
            F.when(F.col("trend").isNotNull(), F.col("__brn"))
        ).alias("__brn1"),
        F.max("__brn").alias("__brn_last"),
        F.max("timestamp").alias("__bucket_last"),
    )
    # trend at brn0/brn1 via a second tiny pass (avoids nested window
    # inside agg which Spark rejects)
    tpoints = (
        g.join(
            F.broadcast(
                anchors.select("series_id", "__brn0", "__brn1")
            ),
            "series_id",
        )
        .filter(
            (F.col("__brn") == F.col("__brn0"))
            | (F.col("__brn") == F.col("__brn1"))
        )
        .groupBy("series_id")
        .agg(
            F.max(
                F.when(F.col("__brn") == F.col("__brn0"), F.col("trend"))
            ).alias("__trend0"),
            F.max(
                F.when(F.col("__brn") == F.col("__brn1"), F.col("trend"))
            ).alias("__trend1"),
        )
    )
    sl = (
        anchors
        .join(F.broadcast(tpoints), "series_id")
        .withColumn(
            "__slope",
            (F.col("__trend1") - F.col("__trend0"))
            / (F.col("__brn1") - F.col("__brn0")),
        )
    )
    seas = g.groupBy("series_id", "__phase").agg(
        F.max("seasonal").alias("__seasonal")
    )
    fc = sl.select(
        "series_id",
        "__brn1",
        "__brn_last",
        "__bucket_last",
        "__trend1",
        "__slope",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, int(horizon) + 1)])
        ).alias("step"),
    ).withColumn(
        "bucket",
        F.expr("__bucket_last + make_interval(0, 0, 0, 0, step, 0, 0)"),
    ).withColumn(
        "trend_fc",
        F.col("__trend1")
        + (F.col("__brn_last") + F.col("step") - F.col("__brn1"))
        * F.col("__slope"),
    )
    out = fc.join(
        F.broadcast(seas),
        (fc["series_id"] == seas["series_id"])
        & (F.hour(fc["bucket"]).cast("int") == seas["__phase"]),
    ).select(
        fc["series_id"],
        "step",
        "bucket",
        "trend_fc",
        F.col("__seasonal").alias("seasonal"),
        (F.col("trend_fc") + F.col("__seasonal")).alias("pred"),
    )
    return out
