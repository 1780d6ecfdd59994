"""Event-stream operators over the raw ``events`` table: time-gap
sessionization and semi-structured (JSON props) extraction.

These exercise the two events-table columns the series adapter drops
(``user_id``, ``props``) with the same engine conventions: native
column algebra only, exact decimal sums for order-independence, and
timestamps reduced to epoch SECONDS (long) so the TIMESTAMP(NANOS)
parquet cannot leak ns-vs-µs drift into the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._exact import DEC
from ..sources.loader import _as_timestamp


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events scan with the ts column normalized and reduced to
    epoch seconds (``ts_s``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # tz-sensitive operators (date_trunc buckets, from_unixtime)
    # must agree with the naive-timestamp DuckDB oracle: pin UTC
    # even under a vanilla (driver-owned) session whose default is
    # the HOST timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp(_as_timestamp(raw, "ts")).alias("ts_s"),
        F.col("value").cast("double").alias("value"),
        "props",
    )


def user_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Time-gap sessionization of per-user event streams: a new session
    starts when the gap to the previous event exceeds ``gap_seconds``.

    Output: one row per (user_id, session_id) with start/end epoch
    seconds, event count, exact-decimal value total, and duration in
    minutes.  The batch mirror of Structured Streaming's session
    window; at scale this is ONE window pass + one aggregate, both
    partitioned by user — the canonical event-analytics shape.
    """
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    brk = F.when(
        F.col("ts_s") - F.lag("ts_s").over(w) > F.lit(int(gap_seconds)), 1
    ).otherwise(0)
    marked = events.withColumn(
        "__brk", F.when(F.lag("ts_s").over(w).isNull(), 1).otherwise(brk)
    ).withColumn("session_id", F.sum("__brk").over(w))
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts_s").alias("start_s"),
        F.max("ts_s").alias("end_s"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        ((F.max("ts_s") - F.min("ts_s")) / F.lit(60.0)).alias("duration_min"),
    )


def session_funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Ordered conversion funnel over sessionized event streams: for
    each funnel step k, how many sessions contain steps 1..k in
    chronological order (first occurrence of each step must be no
    earlier than the previous step's first occurrence).

    One sessionization window pass + one pivot aggregate per session
    (min event time per step as conditional aggregates — no
    re-scan per step) + one tiny funnel count.  Output: (step_idx,
    step, n_sessions, conversion) with conversion = n_k / n_1.
    """
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    brk = F.when(
        F.col("ts_s") - F.lag("ts_s").over(w) > F.lit(int(gap_seconds)), 1
    ).otherwise(0)
    sess = events.withColumn(
        "__brk", F.when(F.lag("ts_s").over(w).isNull(), 1).otherwise(brk)
    ).withColumn("session_id", F.sum("__brk").over(w))
    firsts = sess.groupBy("user_id", "session_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == s, F.col("ts_s"))
            ).alias(f"__t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached_k: every prefix step present, in chronological order
    reach_cols = []
    cond = None
    for i in range(len(steps)):
        this = F.col(f"__t{i}").isNotNull()
        if i > 0:
            this = this & (F.col(f"__t{i}") >= F.col(f"__t{i-1}"))
        cond = this if cond is None else (cond & this)
        reach_cols.append(F.sum(cond.cast("long")).alias(f"__r{i}"))
    counts = firsts.agg(*reach_cols)
    rows = None
    for i, s in enumerate(steps):
        row = counts.select(
            F.lit(i + 1).alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"__r{i}").alias("n_sessions"),
            F.round(
                F.col(f"__r{i}") / (F.col("__r0") + F.lit(1e-9)), 6
            ).alias("conversion"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def event_rollup(events: DataFrame) -> DataFrame:
    """Multi-level OLAP rollup of the event stream: (event_type, day)
    → (event_type) → grand total, computed as ONE grouping-sets
    aggregate (Spark ``rollup``) so all three levels share a single
    shuffle instead of three separate scans+aggs.

    ``gid`` disambiguates the levels (0 = leaf cell, 1 = per-type
    subtotal, 3 = grand total) exactly like SQL ``GROUPING_ID``.
    ``n_users`` is an exact distinct — at 100 TB swap in
    ``approx_count_distinct`` (HLL) to avoid the per-cell distinct
    expansion; the rollup dataflow is unchanged.  Value totals use the
    exact-decimal sum so the result is partition-order independent.
    """
    # day via pure DATE arithmetic on the epoch-second column —
    # from_unixtime/strftime would format in the SESSION/HOST timezone
    # and silently shift near-midnight events on a non-UTC machine
    d = events.withColumn(
        "day",
        F.date_add(
            F.to_date(F.lit("1970-01-01")),
            F.floor(F.col("ts_s") / 86400).cast("int"),
        ).cast("string"),
    )
    return d.rollup("event_type", "day").agg(
        (F.grouping("event_type") * 2 + F.grouping("day"))
        .cast("int")
        .alias("gid"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


def props_field_stats(
    events: DataFrame, field: str = "k", group_col: str = "event_type"
) -> DataFrame:
    """Semi-structured extraction: pull an integer field out of the
    JSON ``props`` column and aggregate it per group — the JSON-path
    projection every telemetry pipeline needs (Spark
    ``get_json_object`` ↔ DuckDB ``json_extract``); stays inside
    codegen, no UDF.
    """
    v = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    d = events.select(F.col(group_col), v.alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    return d.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("__v").alias("total"),
        (F.sum(F.col("__v").cast(DEC)).cast("double") / F.count("*")).alias(
            "mean"
        ),
        F.min("__v").alias("vmin"),
        F.max("__v").alias("vmax"),
    )


def retention_cohorts(
    events: DataFrame, period_seconds: int = 604800
) -> DataFrame:
    """Cohort retention matrix over the event stream: users are
    cohorted by the period (default: week) of their FIRST event, and
    each (cohort, period-offset) cell reports how many of them were
    active that many periods later — the standard growth-analytics
    rollup next to sessionization, funnels, and the OLAP rollup.

    All period math is integer epoch-seconds (no calendar/tz
    functions), so the matrix hashes identically cross-engine.

    Scale shape: one per-user window pass pins the cohort (the same
    exchange sessionization uses), a distinct collapses events to
    (user, cohort, offset) activity — cardinality users × active
    periods, tiny next to events — and the final aggregate + the
    broadcast cohort-size join run on that collapsed frame.

    Output: (cohort, offset, n_active, cohort_size, retention),
    retention = n_active / cohort_size; offset 0 rows have
    retention 1 by construction.
    """
    p = int(period_seconds)
    w = Window.partitionBy("user_id")
    e = events.select(
        "user_id", F.floor(F.col("ts_s") / F.lit(p)).cast("long").alias("b")
    )
    e = e.withColumn("cohort", F.min("b").over(w))
    act = e.select(
        "user_id", "cohort", (F.col("b") - F.col("cohort")).alias("offset")
    ).distinct()
    sizes = (
        act.filter(F.col("offset") == 0)
        .groupBy("cohort")
        .agg(F.count("*").alias("cohort_size"))
    )
    ret = act.groupBy("cohort", "offset").agg(
        F.count("*").alias("n_active")
    )
    return ret.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )
