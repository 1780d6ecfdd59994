"""Sinks: prediction tables, metrics, metrics-tree scan, leaderboard
(SURVEY §2.1 S3–S6).

The reference materializes a ``results/<model>/<dataset>/`` directory
tree of CSV + JSON per run (``src/kalman_model.py:214-240`` etc.);
the Spark-native shape is partitioned parquet keyed by
``(model, series_id)`` — the partition columns ARE the directory
convention, and the metrics "files" are just small DataFrames written
as JSON lines, re-scannable with one glob read (S5) instead of
``os.walk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_predictions(
    df: DataFrame,
    path: str,
    model: str | None = None,
    fmt: str = "parquet",
    partition_by: tuple = ("series_id",),
) -> None:
    """S3: per-row prediction table sink, partitioned for selective
    re-reads (partition pruning on model/series_id replaces the
    reference's directory lookup)."""
    out = df.withColumn("model", F.lit(model)) if model else df
    cols = [c for c in (("model",) + tuple(partition_by)) if c in out.columns]
    (out.write.mode("overwrite").partitionBy(*cols).format(fmt).save(path))


def write_metrics(df: DataFrame, path: str, model: str | None = None) -> None:
    """S4: metrics sink — JSON lines (one row per (model, series));
    the nested-dict-to-file convention becomes a flat, queryable
    table."""
    out = df.withColumn("model", F.lit(model)) if model else df
    out.coalesce(1).write.mode("overwrite").json(path)


def read_metrics_tree(spark: SparkSession, root: str) -> DataFrame:
    """S5: scan every metrics JSON under ``root`` (glob, not os.walk —
    ``src/aggregate_metrics.py:6-53``); the source file path is kept
    for provenance."""
    return spark.read.json(f"{root}/*").withColumn(
        "source_file", F.input_file_name()
    )


def write_leaderboard(df: DataFrame, path: str) -> None:
    """S6: leaderboard sink — F1 desc, single CSV with header
    (``src/aggregate_metrics.py:59-70``)."""
    (
        df.orderBy(F.desc("f1"), "series_id")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
