"""Threshold-grid sweep (SURVEY §2.6 O3 + A4 rate guard).

Reference: every pipeline sweeps ``k ∈ linspace(2,10,17)`` on a score
column, rejects candidates flagging >10% of rows (``src/run_gp.py:
105-107``), keeps the argmax-F1 with FIRST-wins tie-breaking (strict
``>`` in the loop ⇒ smallest k among ties).

Spark-first shape: explode a literal k-grid against the scored frame
(no extra scan — one projection per k via the exploded column), compute
per-(series, k) metrics in ONE aggregate, then ``max_by`` over a
(f1, -k) struct.  The sweep never re-reads or re-shuffles the input
per candidate — at 100 TB this is the difference between 1 scan and 17.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .events import flags_to_events, persistence_filter

EPS = 1e-9


def k_grid(start: float = 2.0, stop: float = 10.0, num: int = 17) -> list[float]:
    """np.linspace equivalent, materialized as plain floats."""
    if num == 1:
        return [float(start)]
    step = (stop - start) / (num - 1)
    return [round(start + i * step, 10) for i in range(num)]


def threshold_sweep_pointwise(
    df: DataFrame,
    score_col: str = "z_mad",
    truth_col: str = "is_anomaly",
    ks: list[float] | None = None,
    max_rate: float = 0.10,
    keys: tuple = ("series_id",),
) -> DataFrame:
    """Sweep ``flag = score > k`` over the grid; pick best-F1 k per series.

    Returns one row per series: ``best_k, f1, precision, recall, rate``.
    Candidates with anomaly rate > max_rate are rejected (A4).  A series
    whose every candidate is rejected is ABSENT from the result —
    callers left-join and ``coalesce(best_k, 3.0)`` (see
    ``plans.pipelines.detection_pipeline``), approximating the
    reference's k=None flag-nothing behavior with a conservative
    default threshold.
    """
    ks = ks or k_grid()
    kdf = F.explode(F.array(*[F.lit(float(k)) for k in ks])).alias("k")
    y = F.col(truth_col)
    flagged = df.select(
        *keys, truth_col, F.col(score_col).alias("__score"), kdf
    ).withColumn("__flag", (F.col("__score") > F.col("k")).cast("int"))
    per_k = flagged.groupBy(*keys, "k").agg(
        F.sum(((y == 1) & (F.col("__flag") == 1)).cast("int")).alias("tp"),
        F.sum(((y == 0) & (F.col("__flag") == 1)).cast("int")).alias("fp"),
        F.sum(((y == 1) & (F.col("__flag") == 0)).cast("int")).alias("fn"),
        F.avg("__flag").alias("rate"),
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp") + F.lit(EPS))
    rec = F.col("tp") / (F.col("tp") + F.col("fn") + F.lit(EPS))
    scored = (
        per_k.withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn(
            "f1",
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall") + F.lit(EPS)),
        )
        .filter(F.col("rate") <= max_rate)
    )
    # first-wins argmax: maximize (f1, -k)
    pick = F.max(
        F.struct(F.col("f1"), (-F.col("k")).alias("negk"), F.col("k"),
                 F.col("precision"), F.col("recall"), F.col("rate"))
    ).alias("b")
    return scored.groupBy(*keys).agg(pick).select(
        *keys,
        F.col("b.k").alias("best_k"),
        F.col("b.f1").alias("f1"),
        F.col("b.precision").alias("precision"),
        F.col("b.recall").alias("recall"),
        F.col("b.rate").alias("rate"),
    )


def threshold_sweep_event(
    df: DataFrame,
    score_col: str = "z_mad",
    truth_col: str = "is_anomaly",
    ks: list[float] | None = None,
    gap: int = 3,
    persist_p: int = 2,
    max_rate: float = 0.10,
) -> DataFrame:
    """The reference's ACTUAL tuning mode (``src/run_bsts.py:69-94``):
    per candidate k — flag, persistence-filter, sessionize to events,
    event-level F1 with gap-merge, rate guard; keep the argmax.

    Spark-first shape: the k-grid is a column, so ONE sessionization
    pass partitioned by (series_id, k) is the only full-data work —
    persistence (drop runs shorter than p: zeroing short 1-runs cannot
    create or merge runs, so run-level filtering ≡ the reference's
    row-level rewrite + re-RLE), the post-persistence anomaly rate
    (Σ surviving run lengths / n rows), and the gap-merge all operate
    on the run table, which is thousands of times smaller than the
    points frame.  True events are computed once (k-independent) and
    broadcast into one overlap join serving both TP sides.
    """
    from .events import merge_runs, raw_runs

    ks = ks or k_grid()
    true_ev = flags_to_events(df, truth_col, gap=gap)
    n_true = true_ev.groupBy("series_id").agg(F.count("*").alias("n_true"))

    kdf = F.explode(F.array(*[F.lit(float(k)) for k in ks])).alias("k")
    flagged = df.select(
        "series_id", "rn", F.col(score_col).alias("__score"), kdf
    ).withColumn("__flag", (F.col("__score") > F.col("k")).cast("int"))
    runs = raw_runs(flagged, "__flag", keys=("series_id", "k")).withColumn(
        "run_len", F.col("end_idx") - F.col("start_idx") + 1
    )
    if persist_p > 1:
        runs = runs.filter(F.col("run_len") >= persist_p)

    # every (series, k) cell must survive even with zero runs — build
    # the grid from the per-series row counts (also the rate denominator)
    n_rows = df.groupBy("series_id").agg(F.count("*").alias("__n"))
    grid = n_rows.select(
        "series_id", "__n", F.explode(F.array(*[F.lit(float(k)) for k in ks])).alias("k")
    )
    flagged_len = runs.groupBy("series_id", "k").agg(
        F.sum("run_len").alias("__flagged")
    )
    rate = grid.join(flagged_len, ["series_id", "k"], "left").select(
        "series_id",
        "k",
        (F.coalesce(F.col("__flagged"), F.lit(0)) / F.col("__n")).alias("rate"),
    )

    pred_ev = merge_runs(runs, gap=gap, keys=("series_id", "k"))
    n_pred = pred_ev.groupBy("series_id", "k").agg(F.count("*").alias("n_pred"))

    t = F.broadcast(
        true_ev.select(
            F.col("series_id").alias("t_sid"),
            F.col("event_id").alias("t_eid"),
            F.col("start_idx").alias("t_start"),
            F.col("end_idx").alias("t_end"),
        )
    )
    overlap = (F.col("end_idx") >= F.col("t_start")) & (
        F.col("start_idx") <= F.col("t_end")
    )
    # ONE overlap join serving both asymmetric TP sides
    hits = pred_ev.join(
        t, on=[F.col("series_id") == F.col("t_sid"), overlap], how="inner"
    ).groupBy("series_id", "k").agg(
        F.countDistinct("event_id").alias("tp"),
        F.countDistinct("t_eid").alias("tp_recall"),
    )
    m = (
        rate.join(n_pred, ["series_id", "k"], "left")
        .join(hits, ["series_id", "k"], "left")
        .join(F.broadcast(n_true), "series_id", "left")
        .fillna(0, ["n_pred", "tp", "tp_recall", "n_true"])
    )
    prec = F.col("tp") / (F.col("n_pred") + F.lit(EPS))
    rec = F.col("tp_recall") / (F.col("n_true") + F.lit(EPS))
    scored = (
        m.withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn(
            "f1",
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall") + F.lit(EPS)),
        )
        .filter(F.col("rate") <= max_rate)
    )
    pick = F.max(
        F.struct(F.col("f1"), (-F.col("k")).alias("negk"), F.col("k"),
                 F.col("precision"), F.col("recall"), F.col("rate"))
    ).alias("b")
    return scored.groupBy("series_id").agg(pick).select(
        "series_id",
        F.col("b.k").alias("best_k"),
        F.col("b.f1").alias("f1"),
        F.col("b.precision").alias("precision"),
        F.col("b.recall").alias("recall"),
        F.col("b.rate").alias("rate"),
    )
