"""S7 diagnostic frames (operators/diagnostics.py): behavioral checks
against numpy ground truth — the cross-engine hash parity is covered by
the qq_plot / histogram_fit oracle gates."""

import numpy as np

from conftest import series_df


def _resid_df(spark, y):
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark.functions.ar import (
        ar1_forecast_native,
    )

    return ar1_forecast_native(series_df(spark, y)).filter(
        F.col("resid").isNotNull()
    )


def test_qq_frame_matches_probplot_math(spark):
    """QQ pairs reproduce scipy.stats.probplot's construction: sorted
    sample against the normal PPF of Filliben medians.  On a clean
    normal sample the points hug the y = x line."""
    from time_series_data_anomaly_detection_spark.functions.kalman import (
        _norm_ppf,
    )
    from time_series_data_anomaly_detection_spark.operators.diagnostics import (
        qq_frame,
    )

    rng = np.random.default_rng(7)
    y = np.cumsum(rng.normal(0, 1, 501))  # AR(1) resid ~ the increments
    out = (
        qq_frame(_resid_df(spark, y), col="resid")
        .orderBy("qq_i")
        .toPandas()
    )
    n = len(out)
    assert n == 500
    # Filliben positions -> Acklam PPF, computed locally
    m = (np.arange(1, n + 1) - 0.3175) / (n + 0.365)
    m[0] = 1 - 0.5 ** (1 / n)
    m[-1] = 0.5 ** (1 / n)
    exp_theo = np.array([_norm_ppf(p) for p in m])
    np.testing.assert_allclose(
        out.theoretical_q.to_numpy(), exp_theo, atol=1e-9
    )
    # sample quantiles are the sorted residuals
    assert (np.diff(out.sample_q.to_numpy()) >= 0).all()
    # near-normal residuals: QQ correlation ~ 1
    r = np.corrcoef(out.theoretical_q, out.sample_q)[0, 1]
    assert r > 0.995


def test_histogram_fit_frame_matches_numpy(spark):
    from time_series_data_anomaly_detection_spark.operators.diagnostics import (
        histogram_fit_frame,
    )

    rng = np.random.default_rng(8)
    y = np.cumsum(rng.normal(0, 2, 801))
    pdf_in = _resid_df(spark, y)
    resid = pdf_in.toPandas().sort_values("rn")["resid"].to_numpy()
    out = histogram_fit_frame(pdf_in, col="resid", bins=50).toPandas()
    assert len(out) == 50 and set(out.bin) == set(range(50))
    # counts match np.histogram over [min, max]
    exp_cnt, edges = np.histogram(resid, bins=50)
    got = out.sort_values("bin").n_bin.to_numpy()
    np.testing.assert_array_equal(got, exp_cnt)
    # density integrates to 1
    width = (resid.max() - resid.min()) / 50
    assert abs(out.density.sum() * width - 1.0) < 1e-9
    # norm.fit overlay: MLE mean + population std; Fisher kurtosis
    assert abs(out.mu.iloc[0] - resid.mean()) < 1e-9
    assert abs(out.sigma.iloc[0] - resid.std(ddof=0)) < 1e-9
    d = resid - resid.mean()
    kurt = (d**4).mean() / (d**2).mean() ** 2 - 3
    assert abs(out["kurtosis"].iloc[0] - kurt) < 1e-6
    # pdf peak sits near mu
    peak = out.loc[out.normal_pdf.idxmax(), "bin_center"]
    assert abs(peak - resid.mean()) < width * 1.5
