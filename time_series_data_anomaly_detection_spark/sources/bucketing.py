"""Bucketed-table layout: the co-located join/aggregate path.

The reference's datasets are small enough to live in single CSV files
(``src/data_loader.py``); at 100 TB the dominant cost of every
per-series pipeline stage is the shuffle that hash-distributes rows by
``series_id`` before windows/joins can run.  Writing the hot tables
bucketed BY that key amortizes the shuffle into the write: Spark
records the bucket spec in the catalog, and every later equi-join or
aggregate on the bucket key reads the existing distribution instead of
exchanging — zero Exchange nodes in the plan (pinned by
``tests/test_plan_shapes.py``).

Scale notes:
- bucket count is fixed at write time; pick ~(total bytes / 128 MB)
  at the target scale so a bucket is one healthy task.  Both sides of
  a co-located join must share bucket count and key.
- bucket pruning: an equality filter on the bucket key scans only the
  matching bucket files (``SelectedBucketsCount`` in the scan node),
  the same effect partition pruning gives low-cardinality keys but
  without the small-files explosion a high-cardinality partitionBy
  would cause.
- ``sort_by`` orders rows inside each bucket file; per-series
  window stages then start from sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: tuple = ("series_id",),
    n_buckets: int = 8,
    sort_by: tuple | None = None,
    fmt: str = "parquet",
) -> None:
    """Materialize ``df`` as an external bucketed table.

    ``saveAsTable`` is required (plain ``save`` cannot record a bucket
    spec); ``path`` makes it external so the data lives where the
    caller chose, not in the session warehouse.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format(fmt)
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec rides along, so downstream
    joins/aggregates on the bucket key skip their exchange."""
    return spark.table(table)
