"""Exchange sizing for CPU-heavy grouped-map UDFs.

AQE's shuffle coalescing is byte-based (``parallelismFirst`` targets
~1 MB partitions): a multi-series frame that is small in BYTES but
expensive per row to model-fit gets coalesced to a handful of
partitions, serializing the pandas-UDF stage (measured: 50 GP fit
groups on 3 of 32 workers).  Model-fit inputs here are always narrow
(series_id, rn, value, ...) while the UDF does O(rows·m²) math, so
bytes are the wrong currency — an explicit hash repartition by the
grouping keys, sized to the cluster's task slots, is honored by AQE
and satisfies the grouped-map's clustered-distribution requirement
(no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def udf_repartition(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-partition ``df`` by ``keys`` into ``defaultParallelism``
    partitions — one task slot each — before a compute-bound
    ``applyInPandas``.  Parallelism is still capped by the distinct
    key count (chunk the work, as gp_forecast does, when that cap
    binds)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *keys)
