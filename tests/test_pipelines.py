"""End-to-end pipeline tests (SURVEY §5): synthetic seasonal series with
injected anomalies; detection must find them."""

import numpy as np
import pandas as pd
import pytest

from time_series_data_anomaly_detection_spark.operators import (
    mark_anomaly_windows,
)
from time_series_data_anomaly_detection_spark.operators.events import (
    persistence_filter,
)
from time_series_data_anomaly_detection_spark.operators.evaluate import (
    event_level_metrics,
)
from time_series_data_anomaly_detection_spark.plans.pipelines import (
    detection_pipeline,
    hybrid_pipeline,
    leaderboard,
    score_model,
)
from time_series_data_anomaly_detection_spark.sources import with_row_index


@pytest.fixture(scope="module")
def seasonal_series(spark):
    """Two seasonal series, 3 injected 8-sigma anomaly bursts each."""
    rng = np.random.default_rng(77)
    frames = []
    for sid in ("alpha", "beta"):
        n = 960
        t = np.arange(n)
        y = 100 + 20 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 2, n)
        for start in (600, 720, 900):
            y[start : start + 3] += 60.0
        frames.append(
            pd.DataFrame(
                {
                    "series_id": sid,
                    "timestamp": pd.date_range("2024-01-01", periods=n, freq="30min"),
                    "value": y,
                    "event_id": range(n),
                }
            )
        )
    return with_row_index(spark.createDataFrame(pd.concat(frames))).cache()


@pytest.fixture(scope="module")
def true_labels(spark):
    rows = []
    for sid in ("alpha", "beta"):
        base = pd.date_range("2024-01-01", periods=960, freq="30min")
        for start in (600, 720, 900):
            rows.append((sid, base[start]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["series_id", "label_ts"]))


def _event_f1(flagged, gap=3):
    rows = event_level_metrics(flagged, gap=gap).collect()
    return {r.series_id: r.f1 for r in rows}


@pytest.mark.parametrize("model,k", [("stl", 6.0), ("ar", 4.5)])
def test_injected_anomalies_found(spark, seasonal_series, true_labels, model, k):
    # k is per-model: AR one-step predictions partially absorb burst
    # points 2..n via the contaminated lag-1 (the reference's LSTM has
    # the same structure) -> lower threshold; in real use the
    # validation sweep picks k
    labeled = mark_anomaly_windows(seasonal_series, true_labels, 3)
    from pyspark.sql import functions as F

    scored = score_model(seasonal_series, model, period=24).join(
        labeled.select("series_id", "rn", "is_anomaly"), ["series_id", "rn"]
    )
    flagged = persistence_filter(
        scored.withColumn("flag", (F.col("score") > k).cast("int")), "flag", p=2
    )
    f1s = _event_f1(flagged)
    for sid, f1 in f1s.items():
        # epsilon guards in the F1 formula shave ~1e-9 off exact ratios
        assert f1 >= 0.8 - 1e-6, f"{model}/{sid}: event F1 {f1}"


def test_detection_pipeline_end_to_end(spark, seasonal_series):
    res = detection_pipeline(seasonal_series, model="stl", period=24)
    em = res["event_metrics"].collect()
    assert {r.series_id for r in em} == {"alpha", "beta"}
    bm = {r.series_id: r for r in res["business_metrics"].collect()}
    assert all(r.duration_days > 0 for r in bm.values())
    ks = {r.series_id: r.best_k for r in res["best_k"].collect()}
    assert all(k is not None for k in ks.values())


def test_hybrid_and_leaderboard(spark, seasonal_series):
    hyb = hybrid_pipeline(seasonal_series, period=24, k=5.0)
    em = hyb["event_metrics"]
    lb = leaderboard([em]).collect()
    assert lb and all(r.model == "hybrid" for r in lb)
    # hybrid must actually detect the bursts
    assert max(r.f1 for r in lb) > 0.5


def test_run_benchmark_isolates_model_failure(spark, seasonal_series, monkeypatch):
    """Per-model failure isolation (src/run_final_benchmark.py:52-76):
    with on_error='skip', a model whose UDF raises AT RUNTIME costs only
    its own rows — the leaderboard still materializes for the rest."""
    from time_series_data_anomaly_detection_spark.plans import pipelines

    real_score_model = pipelines.score_model

    def exploding_score_model(df, model="kalman", **kw):
        if model != "boom":
            return real_score_model(df, model, **kw)

        def blow_up(pdf):
            raise ValueError("injected model failure")

        return df.groupBy("series_id").applyInPandas(
            blow_up,
            "series_id string, rn long, timestamp timestamp, "
            "value double, score double",
        )

    monkeypatch.setattr(pipelines, "score_model", exploding_score_model)
    with pytest.warns(RuntimeWarning, match="model 'boom' failed"):
        lb = pipelines.run_benchmark(
            seasonal_series, models=("ar1", "boom"), on_error="skip"
        ).collect()
    assert lb and {r.model for r in lb} == {"ar1"}
    assert {r.series_id for r in lb} == {"alpha", "beta"}

    # default on_error='raise' propagates (fused-DAG path unchanged)
    with pytest.raises(Exception):
        pipelines.run_benchmark(
            seasonal_series, models=("ar1", "boom")
        ).collect()


def test_release_caches_empties_storage(spark):
    """Cache hygiene (round-2 verdict): every cache a registry query
    creates — including the datapipe dedup caches — is ledgered, so
    release_caches() leaves executor storage empty."""
    from time_series_data_anomaly_detection_spark.datapipe.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from time_series_data_anomaly_detection_spark.session import release_caches
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",
                    "completely different text about spark engines",
                    "another unrelated document body here",
                    "the quick brown fox jumps over the lazy dog",
                    "spark engines process distributed data frames",
                ],
            }
        )
    )
    ngram_jaccard_pairs(docs, threshold=0.3).count()
    minhash_lsh_pairs(docs, threshold=0.3).count()
    release_caches()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() == 0
