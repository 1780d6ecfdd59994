"""Sources: multi-series loaders (SURVEY §2.1 S1/S2) and row indexing.

Reference semantics: ``src/load_nab.py:9-34`` reads one ``(timestamp,
value)`` CSV per series, coercing headerless files, parsing timestamps
and sorting ascending.  Our engine generalizes to ONE DataFrame holding
many series keyed by ``series_id`` so that every per-series operator is
a partitioned window / grouped map — this is the scale axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SERIES_COLS = ("series_id", "timestamp", "value")


def load_series_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    series_from_filename: bool = True,
) -> DataFrame:
    """NAB-style CSV scan (reference ``src/load_nab.py:9-34``).

    Reads one or many ``timestamp,value`` CSVs into the multi-series
    frame.  Headerless files are coerced by position, mirroring the
    reference's first-two-columns rename (``src/load_nab.py:26-31``).
    Sorting is NOT applied here: order is declared per-operator via
    ``Window.partitionBy(series_id).orderBy(timestamp)``, which lets the
    scan stay parallel and pushdown-friendly.
    """
    if header:
        df = spark.read.option("header", True).csv(path)
        ts_col, val_col = df.columns[0], df.columns[1]
    else:
        df = spark.read.option("header", False).csv(path)
        ts_col, val_col = "_c0", "_c1"
    out = df.select(
        F.to_timestamp(F.col(ts_col)).alias("timestamp"),
        F.col(val_col).cast("double").alias("value"),
    )
    if series_from_filename:
        out = out.withColumn(
            "series_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1),
        )
    else:
        out = out.withColumn("series_id", F.lit("series_0"))
    return out.select(*SERIES_COLS)


def load_labels_json(spark: SparkSession, path: str) -> DataFrame:
    """NAB ``combined_labels.json`` scan (reference ``src/load_nab.py:36-44``).

    The file is one JSON object ``{series_key: [ts, ...]}``; we read it
    as a single row and explode to a tall ``(series_id, label_ts)``
    frame.  The result is tiny — callers broadcast it into the as-of
    label join (operators.labeling).
    """
    raw = spark.read.option("multiLine", True).json(path)
    # NAB keys are paths ("realKnownCause/a.csv") — backtick-quote so
    # the dot is not parsed as a struct field access
    cols = [F.col(f"`{c}`") for c in raw.columns]
    stacked = raw.select(
        F.explode(
            F.from_json(F.to_json(F.struct(*cols)), "map<string,array<string>>")
        ).alias("series_id", "ts_list")
    )
    return stacked.select(
        "series_id", F.explode("ts_list").alias("label_ts")
    ).withColumn("label_ts", F.to_timestamp("label_ts"))


def events_as_series(
    spark: SparkSession,
    sf_dir: str,
    series_col: str = "event_type",
) -> DataFrame:
    """Adapt the synthetic ``events`` table to the series data model.

    ``events(event_id, ts, user_id, event_type, value, props)`` becomes
    ``(series_id, timestamp, value, event_id)`` with one series per
    event_type.  ``event_id`` is kept as a deterministic tie-breaker for
    row ordering (timestamps are unique in the test data, but the engine
    must not depend on that).
    """
    # the driver may hand us a session without the nanos flag; it is a
    # runtime-settable SQL conf, needed before schema inference
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # tz-sensitive operators (date_trunc buckets, from_unixtime)
    # must agree with the naive-timestamp DuckDB oracle: pin UTC
    # even under a vanilla (driver-owned) session whose default is
    # the HOST timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        F.col(series_col).alias("series_id"),
        _as_timestamp(raw, "ts").alias("timestamp"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id"),
    )


def _as_timestamp(df: DataFrame, col: str):
    """Normalize a parquet timestamp column: TIMESTAMP(NANOS) files are
    read as long nanoseconds (spark.sql.legacy.parquet.nanosAsLong) and
    converted back to microsecond timestamps here."""
    if dict(df.dtypes)[col] == "bigint":
        # integer division: (x / 1000).cast(long) routes through double,
        # and epoch nanos (~1.7e18) exceed 2^53 — a ±1µs parity hazard
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    return F.col(col)


def with_row_index(df: DataFrame, order_cols: tuple = ("timestamp", "event_id")) -> DataFrame:
    """Attach the 1-based per-series positional index ``rn``.

    The reference relies on pandas' implicit row order (``sort_values`` +
    ``reset_index``, ``src/load_nab.py:33``); in Spark positional
    semantics are reconstructed explicitly with ``row_number`` over the
    series partition.  Cost: one shuffle by series_id, shared by every
    downstream window over the same key.
    """
    cols = [c for c in order_cols if c in df.columns]
    w = Window.partitionBy("series_id").orderBy(*[F.col(c) for c in cols])
    return df.withColumn("rn", F.row_number().over(w))
