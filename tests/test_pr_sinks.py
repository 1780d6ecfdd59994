"""PR-curve / average-precision semantics + sink round-trips."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_series_data_anomaly_detection_spark.operators.evaluate import (
    average_precision,
    pr_curve,
)
from time_series_data_anomaly_detection_spark.sources import (
    read_metrics_tree,
    write_leaderboard,
    write_metrics,
    write_predictions,
)


@pytest.fixture(scope="module")
def scored(spark):
    # scores 5..1 desc, truth on the two highest-scoring rows
    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "score": [5.0, 4.0, 3.0, 2.0, 1.0],
            "is_anomaly": [1, 1, 0, 0, 0],
        }
    )
    return spark.createDataFrame(pdf)


def test_pr_curve_points(spark, scored):
    rows = {
        r.threshold: r for r in pr_curve(scored, "score").collect()
    }
    assert rows[5.0].precision == pytest.approx(1.0)
    assert rows[5.0].recall == pytest.approx(0.5, rel=1e-6)
    assert rows[4.0].precision == pytest.approx(1.0)
    assert rows[4.0].recall == pytest.approx(1.0, rel=1e-6)
    assert rows[1.0].precision == pytest.approx(2 / 5)
    assert rows[1.0].recall == pytest.approx(1.0, rel=1e-6)


def test_average_precision_perfect_ranking(spark, scored):
    ap = average_precision(scored, "score").collect()[0].average_precision
    # perfect ranking -> AP = 1.0 (up to the n_pos epsilon)
    assert ap == pytest.approx(1.0, abs=1e-6)


def test_average_precision_worst_ranking(spark):
    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "score": [5.0, 4.0, 3.0, 2.0, 1.0],
            "is_anomaly": [0, 0, 0, 1, 1],
        }
    )
    ap = (
        average_precision(spark.createDataFrame(pdf), "score")
        .collect()[0]
        .average_precision
    )
    # step AP: positives at ranks 4 and 5 -> (1/4 + 2/5) / 2 = 0.325
    assert ap == pytest.approx(0.325, abs=1e-6)


def test_nan_scores_masked(spark):
    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "score": [5.0, np.nan, 3.0],
            "is_anomaly": [1, 1, 0],
        }
    )
    curve = pr_curve(spark.createDataFrame(pdf), "score").collect()
    assert len(curve) == 2  # NaN row dropped


def test_sink_round_trips(spark, tmp_path, scored):
    pred_path = str(tmp_path / "pred")
    write_predictions(scored, pred_path, model="m1")
    back = spark.read.parquet(pred_path)
    assert back.count() == 5
    assert set(back.columns) >= {"score", "is_anomaly", "model", "series_id"}

    metrics = scored.groupBy("series_id").agg(F.avg("score").alias("f1"))
    mpath = str(tmp_path / "metrics" / "m1")
    write_metrics(metrics, mpath, model="m1")
    tree = read_metrics_tree(spark, str(tmp_path / "metrics"))
    assert tree.count() == 1
    assert tree.collect()[0].model == "m1"

    lb_path = str(tmp_path / "lb")
    write_leaderboard(metrics.withColumn("model", F.lit("m1")), lb_path)
    lb = spark.read.option("header", True).csv(lb_path)
    assert lb.count() == 1
