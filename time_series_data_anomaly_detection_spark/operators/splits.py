"""Positional fractional splits (SURVEY §2.2 P3/P4).

Reference: ``train_end = int(n * frac)`` positional slicing
(``src/kalman_model.py:168-171``, 3-way at ``src/run_bsts.py:32-35``).
Spark shape: per-series row counts (one row per series, broadcast back)
+ a CASE over ``rn``.  Labels match the reference's artifact vocabulary
('Train'/'Validation'/'Test', ``src/run_bsts.py:131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fractional_split(
    df: DataFrame,
    train_frac: float = 0.5,
    val_frac: float | None = 0.25,
    out_col: str = "split",
) -> DataFrame:
    """Assign 'Train' / 'Validation' / 'Test' by positional fraction.

    ``rn <= floor(n*train_frac)`` → Train; next ``floor(n*(train_frac+
    val_frac))`` → Validation; rest → Test.  With ``val_frac=None`` the
    output is two-way Train/Test (reference Kalman/GP/LSTM pipelines).
    Requires ``rn`` from sources.with_row_index.
    """
    counts = df.groupBy("series_id").agg(F.max("rn").alias("__n"))
    out = df.join(F.broadcast(counts), "series_id")
    train_end = F.floor(F.col("__n") * F.lit(train_frac))
    if val_frac is None:
        split = F.when(F.col("rn") <= train_end, "Train").otherwise("Test")
    else:
        val_end = F.floor(F.col("__n") * F.lit(train_frac + val_frac))
        split = (
            F.when(F.col("rn") <= train_end, "Train")
            .when(F.col("rn") <= val_end, "Validation")
            .otherwise("Test")
        )
    return out.withColumn(out_col, split).drop("__n")
