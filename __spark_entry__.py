"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship anomaly-detection pipeline at sf0.001.
queries()      -> every implemented operator from SURVEY.md §2.
oracle_sql()   -> DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from time_series_data_anomaly_detection_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: label → adaptive-threshold detect → persistence →
    event-level metrics, per series, on sf0.001 (SURVEY §3.2 shape)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _registry.q_event_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
