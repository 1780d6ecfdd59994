"""Label-window marking: point labels → ±w-row anomaly windows (P2/J1).

Reference ``mark_anomaly_windows`` (``src/load_nab.py:46-61``): for each
label timestamp, binary-search the insertion index (first row with
``timestamp >= label_ts``), then set ``is_anomaly = 1`` on rows
``[idx - w, idx + w]`` (row-count window, clamped to the series).

Spark-first shape: the labels table is tiny — broadcast it twice:
1. as-of join: per label, ``min(rn) where timestamp >= label_ts``
   (a broadcast theta join + groupBy label, never a shuffle of the
   series table);
2. range join: mark rows with ``rn BETWEEN lo AND hi``; overlapping
   windows collapse via the join's semi semantics.
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
    nrows = series.groupBy("series_id").agg(F.max("rn").alias("__n"))
    # as-of: first row at-or-after the label instant; clamp to series end
    anchored = (
        F.broadcast(labels)
        .join(series.select("series_id", "timestamp", "rn"),
              on=[labels.series_id == series.series_id,
                  series.timestamp >= labels.label_ts],
              how="left")
        .groupBy(labels.series_id.alias("series_id"), "label_ts")
        .agg(F.min("rn").alias("__anchor"))
        .join(F.broadcast(nrows), "series_id")
        .select(
            "series_id",
            F.coalesce("__anchor", "__n").alias("__anchor"),
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
    return series.join(marked, ["series_id", "rn"], "left").fillna(
        {out_col: 0}
    )
