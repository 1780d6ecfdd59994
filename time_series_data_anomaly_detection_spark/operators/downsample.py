"""Visualization-oriented time-series downsampling (M4).

The reference renders every series with matplotlib at full resolution
(``src/plotting.py:8-76``) — viable for NAB-sized series, not for a
dashboard over 100 TB.  M4 (Jugel et al., VLDB 2014, "M4: A
Visualization-Oriented Time Series Data Aggregation") is the classical
error-free-at-pixel-resolution reduction: split each series into one
bucket per horizontal pixel and keep only the first, last, minimum and
maximum points of every bucket (≤ 4·width points/series), which
reproduces the exact line rendering of the full-resolution series.

Spark-first shape: one broadcast join for the per-series length, then
four ``row_number`` windows that share ONE exchange on
``(series_id, bucket)`` (Spark reuses the partitioning across the four
sort orders).  Output is ≤ ``4 · n_buckets`` rows/series regardless of
input size — the egress stays constant as the fact table scales.
Deterministic tie-breaks everywhere: ties on value resolve to the
earliest (min) / latest (max) row, so the survivor set is unique and
hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    n_buckets: int = 256,
    value_col: str = "value",
) -> DataFrame:
    """Reduce each series to the M4 pixel-bucket survivors.

    Expects ``series_id`` and a dense positional index ``rn`` (1..n per
    series, from ``with_row_index``).  Bucket assignment mirrors pixel
    columns: ``bucket = floor((rn-1) * n_buckets / n)`` in double
    arithmetic (bit-identical across engines).  Emits one row per
    surviving point with the roles it plays.
    """
    v = F.col(value_col)
    n_per = df.groupBy("series_id").agg(F.max("rn").alias("__n"))
    b = df.join(F.broadcast(n_per), "series_id").withColumn(
        "bucket",
        F.floor(
            (F.col("rn") - F.lit(1)).cast("double")
            * F.lit(float(n_buckets))
            / F.col("__n").cast("double")
        ).cast("long"),
    )
    pk = ["series_id", "bucket"]
    w_min = Window.partitionBy(*pk).orderBy(v.asc(), F.col("rn").asc())
    w_max = Window.partitionBy(*pk).orderBy(v.desc(), F.col("rn").desc())
    w_first = Window.partitionBy(*pk).orderBy(F.col("rn").asc())
    w_last = Window.partitionBy(*pk).orderBy(F.col("rn").desc())
    r = (
        b.withColumn("__is_min", (F.row_number().over(w_min) == 1).cast("int"))
        .withColumn("__is_max", (F.row_number().over(w_max) == 1).cast("int"))
        .withColumn("__is_first", (F.row_number().over(w_first) == 1).cast("int"))
        .withColumn("__is_last", (F.row_number().over(w_last) == 1).cast("int"))
    )
    return (
        r.filter(
            (F.col("__is_min") + F.col("__is_max") + F.col("__is_first") + F.col("__is_last"))
            > 0
        )
        .select(
            "series_id",
            "bucket",
            "rn",
            v.alias(value_col),
            F.col("__is_min").alias("is_min"),
            F.col("__is_max").alias("is_max"),
            F.col("__is_first").alias("is_first"),
            F.col("__is_last").alias("is_last"),
        )
    )
