"""Evaluation suite: pointwise, event-level, and business metrics.

Reference: ``src/evaluate.py`` —
- A1 ``precision_recall_f1`` (:6-17): confusion counts with the exact
  epsilon placement ``tp/(tp+fp+1e-9)``, ``f1 = 2PR/(P+R+1e-9)``.
- A2 ``compute_event_level_metrics`` (:65-123): ASYMMETRIC event TP —
  precision counts predicted events overlapping ANY true event
  (``not (pe < ts or ps > te)``), recall counts true events overlapped
  by ANY predicted event; ``fp = n_pred - tp``, ``fn = n_true -
  tp_recall``.
- A3 ``compute_business_metrics`` (:148-207): FP events per day
  (duration from first/last timestamp) and median latency in minutes
  (per true event, earliest overlapping predicted event's start minus
  true start; can be negative).

Spark-first shape: both event tables are tiny (one row per run), so the
interval-overlap theta joins are broadcast nested-loop joins over
frames of ~10s of rows per series — negligible next to the points
scan.  All metrics come out as one row per series (a DataFrame, not a
dict), which is what a 1M-series cluster run needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .events import flags_to_events

EPS = 1e-9


def pointwise_metrics(
    df: DataFrame, truth_col: str = "is_anomaly", pred_col: str = "flag"
) -> DataFrame:
    """A1: per-series confusion counts + precision/recall/f1."""
    y, p = F.col(truth_col), F.col(pred_col)
    agg = df.groupBy("series_id").agg(
        F.sum(((y == 1) & (p == 1)).cast("int")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("int")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("int")).alias("fn"),
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp") + F.lit(EPS))
    rec = F.col("tp") / (F.col("tp") + F.col("fn") + F.lit(EPS))
    out = agg.withColumn("precision", prec).withColumn("recall", rec)
    return out.withColumn(
        "f1",
        2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall") + F.lit(EPS)),
    )


def _overlap_counts(true_ev: DataFrame, pred_ev: DataFrame):
    """Existential overlap joins between the two event tables.

    Returns (per-series pred-event TP counts, per-series true-event hit
    table with earliest overlapping pred start).  Overlap predicate is
    the reference's ``not (pe < ts or ps > te)`` ⇔
    ``pe >= ts AND ps <= te``.
    """
    t = true_ev.select(
        F.col("series_id").alias("t_sid"),
        F.col("event_id").alias("t_eid"),
        F.col("start_idx").alias("t_start"),
        F.col("end_idx").alias("t_end"),
    )
    p = pred_ev.select(
        F.col("series_id").alias("p_sid"),
        F.col("event_id").alias("p_eid"),
        F.col("start_idx").alias("p_start"),
        F.col("end_idx").alias("p_end"),
    )
    overlap = (F.col("p_end") >= F.col("t_start")) & (
        F.col("p_start") <= F.col("t_end")
    )
    # predicted events that hit any true event (precision-side TP)
    pred_hits = (
        p.join(
            F.broadcast(t),
            on=[F.col("p_sid") == F.col("t_sid"), overlap],
            how="left_semi",
        )
        .groupBy(F.col("p_sid").alias("series_id"))
        .agg(F.count("*").alias("tp"))
    )
    # true events hit by any predicted event, with earliest pred start
    true_hits = (
        t.join(
            F.broadcast(p),
            on=[F.col("p_sid") == F.col("t_sid"), overlap],
            how="inner",
        )
        .groupBy(
            F.col("t_sid").alias("series_id"),
            F.col("t_eid").alias("event_id"),
            F.col("t_start").alias("t_start"),
        )
        .agg(F.min("p_start").alias("first_pred_start"))
    )
    return pred_hits, true_hits


def event_level_metrics(
    df: DataFrame,
    truth_col: str = "is_anomaly",
    pred_col: str = "flag",
    gap: int = 0,
) -> DataFrame:
    """A2: event-level P/R/F1 per series with the reference's asymmetric TP."""
    true_ev = flags_to_events(df, truth_col, gap=gap)
    pred_ev = flags_to_events(df, pred_col, gap=gap)
    pred_hits, true_hits = _overlap_counts(true_ev, pred_ev)
    n_true = true_ev.groupBy("series_id").agg(F.count("*").alias("n_true_events"))
    n_pred = pred_ev.groupBy("series_id").agg(F.count("*").alias("n_pred_events"))
    tp_recall = true_hits.groupBy("series_id").agg(
        F.count("*").alias("tp_recall")
    )
    base = df.select("series_id").distinct()
    out = (
        base.join(n_true, "series_id", "left")
        .join(n_pred, "series_id", "left")
        .join(pred_hits, "series_id", "left")
        .join(tp_recall, "series_id", "left")
        .fillna(0, ["n_true_events", "n_pred_events", "tp", "tp_recall"])
    )
    out = (
        out.withColumn("fp", F.col("n_pred_events") - F.col("tp"))
        .withColumn("fn", F.col("n_true_events") - F.col("tp_recall"))
        .withColumn(
            "precision", F.col("tp") / (F.col("n_pred_events") + F.lit(EPS))
        )
        .withColumn(
            "recall", F.col("tp_recall") / (F.col("n_true_events") + F.lit(EPS))
        )
    )
    return out.withColumn(
        "f1",
        2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall") + F.lit(EPS)),
    ).drop("tp_recall")


def business_metrics(
    df: DataFrame,
    truth_col: str = "is_anomaly",
    pred_col: str = "flag",
    gap: int = 0,
) -> DataFrame:
    """A3: FP events/day + median detection latency (minutes) per series.

    Latency per true event = timestamp at the earliest overlapping
    predicted event's start row minus timestamp at the true start row;
    median across hit true events (null when none — the reference
    emits NaN).
    """
    true_ev = flags_to_events(df, truth_col, gap=gap)
    pred_ev = flags_to_events(df, pred_col, gap=gap)
    pred_hits, true_hits = _overlap_counts(true_ev, pred_ev)
    n_pred = pred_ev.groupBy("series_id").agg(F.count("*").alias("n_pred_events"))
    duration = df.groupBy("series_id").agg(
        (
            (F.unix_timestamp(F.max("timestamp")) - F.unix_timestamp(F.min("timestamp")))
            / F.lit(86400.0)
        ).alias("duration_days")
    )
    ts_by_rn = df.select("series_id", "rn", "timestamp")
    lat = (
        true_hits.join(
            ts_by_rn.withColumnRenamed("rn", "t_start").withColumnRenamed(
                "timestamp", "true_ts"
            ),
            ["series_id", "t_start"],
        )
        .join(
            ts_by_rn.withColumnRenamed("rn", "first_pred_start").withColumnRenamed(
                "timestamp", "pred_ts"
            ),
            ["series_id", "first_pred_start"],
        )
        .withColumn(
            "latency_min",
            (F.unix_timestamp("pred_ts") - F.unix_timestamp("true_ts")) / F.lit(60.0),
        )
        .groupBy("series_id")
        .agg(F.percentile(F.col("latency_min"), F.lit(0.5)).alias("median_latency_minutes"))
    )
    base = df.select("series_id").distinct()
    out = (
        base.join(n_pred, "series_id", "left")
        .join(pred_hits, "series_id", "left")
        .join(duration, "series_id", "left")
        .join(lat, "series_id", "left")
        .fillna(0, ["n_pred_events", "tp"])
        .withColumn("fp_count", F.col("n_pred_events") - F.col("tp"))
        .withColumn(
            "fp_per_day",
            F.when(
                F.col("duration_days") > 0,
                F.col("fp_count") / F.col("duration_days"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.select(
        "series_id", "fp_count", "duration_days", "fp_per_day", "median_latency_minutes"
    )


def pr_curve(
    df: DataFrame, score_col: str = "score", truth_col: str = "is_anomaly"
) -> DataFrame:
    """A7: precision-recall curve per series from a continuous score.

    One point per distinct score value (the threshold ``pred = score >=
    t``): cumulative TP/FP over the score-descending order, collapsed
    to the last row per distinct score. NaN/null scores are masked
    first (reference ``src/plotting.py:60-62``).

    Scale: a single window over ``(series, score desc)`` — one
    shuffle, no self-join; the curve is at most one row per distinct
    score.
    """
    d = df.filter(
        F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col))
    ).select(
        "series_id",
        F.col(score_col).alias("score"),
        F.col(truth_col).cast("int").alias("y"),
    )
    w = Window.partitionBy("series_id").orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    npos = Window.partitionBy("series_id")
    cum = d.select(
        "series_id",
        "score",
        F.sum("y").over(w).alias("cum_tp"),
        (F.count("*").over(w) - F.sum("y").over(w)).alias("cum_fp"),
        F.sum("y").over(npos).alias("n_pos"),
    )
    # last cumulative row per distinct score = the threshold point
    per_t = cum.groupBy("series_id", "score").agg(
        F.max("cum_tp").alias("tp"),
        F.max("cum_fp").alias("fp"),
        F.max("n_pos").alias("n_pos"),
    )
    return per_t.select(
        "series_id",
        F.col("score").alias("threshold"),
        "tp",
        "fp",
        (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
        (F.col("tp") / (F.col("n_pos") + F.lit(EPS))).alias("recall"),
    )


def average_precision(
    df: DataFrame, score_col: str = "score", truth_col: str = "is_anomaly"
) -> DataFrame:
    """A7: average precision (PR-AUC, step integration) per series:
    ``AP = Σ (R_i − R_{i−1}) · P_i`` over thresholds descending —
    the standard summary the reference computes with sklearn
    (``src/plotting.py:64-65``; step vs trapezoid noted there).
    """
    curve = pr_curve(df, score_col, truth_col)
    w = Window.partitionBy("series_id").orderBy(F.desc("threshold"))
    stepped = curve.withColumn(
        "prev_recall", F.coalesce(F.lag("recall").over(w), F.lit(0.0))
    )
    return stepped.groupBy("series_id").agg(
        F.sum(
            (F.col("recall") - F.col("prev_recall")) * F.col("precision")
        ).alias("average_precision")
    )
