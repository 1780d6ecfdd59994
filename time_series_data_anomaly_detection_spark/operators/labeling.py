"""Label-window marking: point labels → ±w-row anomaly windows (P2/J1).

Reference ``mark_anomaly_windows`` (``src/load_nab.py:46-61``): for each
label timestamp, binary-search the insertion index (first row with
``timestamp >= label_ts``), then set ``is_anomaly = 1`` on rows
``[idx - w, idx + w]`` (row-count window, clamped to the series).

Spark-first shape:
1. as-of anchor: labels are UNIONED into the ordered point stream and
   anchored with one running-min window over (series, ts desc) — the
   broadcast theta join (``series.ts >= label_ts`` then ``min(rn)``)
   materializes O(labels × rows/2) intermediate pairs per series,
   which explodes at scale; the union+window form is O(rows + labels)
   on the same series exchange every downstream operator already uses;
2. range mark: broadcast the tiny ``(series_id, lo, hi)`` window table
   into a hash semi-join on series_id with the BETWEEN as residual;
   overlapping windows collapse via the semi semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_value_labels(df: DataFrame, n: int = 5) -> DataFrame:
    """Deterministic synthetic labels: the n largest values per series.

    Stand-in for NAB's ``combined_labels.json`` on the synthetic tables:
    returns ``(series_id, label_ts)``.  Ties broken by timestamp then
    event_id so the label set is unique and stable.
    """
    order = [F.col("value").desc()] + [
        F.col(c) for c in ("timestamp", "event_id") if c in df.columns
    ]
    w = Window.partitionBy("series_id").orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .select("series_id", F.col("timestamp").alias("label_ts"))
    )


def mark_top_value_windows(
    df: DataFrame,
    n: int = 5,
    window_size: int = 3,
    out_col: str = "is_anomaly",
) -> DataFrame:
    """Fused ``top_value_labels`` + ``mark_anomaly_windows`` for the
    synthetic label set: ``is_anomaly = 1`` within ±window_size ROWS of
    one of the n largest values per series.

    Because a synthetic label IS a data row, its as-of anchor is its own
    ``rn`` — so the whole P2/J1 pass collapses to two window ops on the
    series exchange every pipeline already has: a value-rank indicator,
    then a banded ``max`` over ±window_size rows.  Zero joins, zero
    broadcast-build jobs (the general :func:`mark_anomaly_windows` runs
    1 union pass + 3 broadcast builds per call — measurably slower when
    a pipeline marks labels once per model branch).  Semantics are
    identical to composing the two general operators on in-range labels.
    """
    order = [F.col("value").desc()] + [
        F.col(c) for c in ("timestamp", "event_id") if c in df.columns
    ]
    w_rank = Window.partitionBy("series_id").orderBy(*order)
    w_band = (
        Window.partitionBy("series_id")
        .orderBy("rn")
        .rowsBetween(-window_size, window_size)
    )
    return (
        df.withColumn(
            "__is_lbl", (F.row_number().over(w_rank) <= n).cast("int")
        )
        .withColumn(out_col, F.max("__is_lbl").over(w_band))
        .drop("__is_lbl")
    )


def mark_anomaly_windows(
    series: DataFrame,
    labels: DataFrame,
    window_size: int = 3,
    out_col: str = "is_anomaly",
) -> DataFrame:
    """P2: mark ``is_anomaly=1`` within ±window_size ROWS of each label.

    ``series`` must carry ``rn`` (sources.with_row_index).  Labels that
    fall after the last row of a series anchor at the last row —
    matching numpy ``searchsorted`` clamping (``src/load_nab.py:58-59``).
    """
    # as-of: first row at-or-after the label instant; clamp to series
    # end.  Labels ride the ordered point stream: over (series, ts
    # DESC, points-before-labels-on-ties) the running min(rn) at a
    # label row is exactly min(rn | ts >= label_ts) — searchsorted
    # semantics in one window pass, no theta-join blowup.  The series
    # length rides the SAME exchange as a whole-partition max(rn)
    # (a separate groupBy + broadcast join would re-scan the input).
    pts = series.select(
        "series_id", "timestamp", "rn", F.lit(0).alias("__lbl")
    )
    lbl = labels.select(
        "series_id",
        F.col("label_ts").alias("timestamp"),
        F.lit(None).cast("long").alias("rn"),
        F.lit(1).alias("__lbl"),
    )
    w = Window.partitionBy("series_id").orderBy(
        F.col("timestamp").desc(), F.col("__lbl").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("series_id")
    anchored = (
        pts.unionByName(lbl)
        .withColumn("__anchor", F.min("rn").over(w))
        .withColumn("__n", F.max("rn").over(wp))
        .filter(F.col("__lbl") == 1)
        .select(
            "series_id",
            # a label past the series end has no at-or-after row: anchor
            # it one past the end (n+1) so the lo/hi clamp below marks
            # [n-w+1, n] — exactly numpy searchsorted + window clamping
            # in the reference (idx=n, window [idx-w, idx+w] clipped)
            F.coalesce("__anchor", F.col("__n") + F.lit(1)).alias("__anchor"),
            "__n",
        )
        .select(
            "series_id",
            F.greatest(F.col("__anchor") - window_size, F.lit(1)).alias("__lo"),
            F.least(F.col("__anchor") + window_size, F.col("__n")).alias("__hi"),
        )
        .distinct()
    )
    marked = (
        series.join(
            F.broadcast(anchored),
            on=[series.series_id == anchored.series_id,
                series.rn.between(anchored.__lo, anchored.__hi)],
            how="left_semi",
        )
        .select("series_id", "rn")
        .withColumn(out_col, F.lit(1))
    )
    # marked is at most labels x (2w+1) rows per series — broadcast the
    # join-back, or Spark plans a sort-merge join that reshuffles the
    # full points frame on (series_id, rn) (marked inherits the series
    # frame's size estimate)
    return series.join(F.broadcast(marked), ["series_id", "rn"], "left").fillna(
        {out_col: 0}
    )
