"""Profile the per-series Python fit kernels directly (no Spark): load
the sf0.1 events table, build the 5 series, and cProfile each kernel on
the largest series.  This is the guide-§4 "profile the worker" step for
the grouped-map fit families (VERDICT r13 item #1) — the kernels are
pure pandas→pandas functions, so profiling them in-process measures
exactly what the Arrow worker runs, minus the boundary cost that the
Spark-level A/B cells capture separately.

Usage: python scripts/r14_profile_fits.py [kernel ...]
Kernels: kalman_em kalman_fixed bsts_fixed bsts_dummy bsts_multi
         bocpd lstm gp ar1 stl all
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def load_series(sf_dir: str = "/root/testdata/sf0.1") -> pd.DataFrame:
    import pyarrow.parquet as pq

    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    s = df.rename(columns={"event_type": "series_id", "ts": "timestamp"})[
        ["series_id", "timestamp", "value"]
    ]
    s = s.sort_values(["series_id", "timestamp"]).reset_index(drop=True)
    s["rn"] = s.groupby("series_id").cumcount() + 1
    return s


def one_series(s: pd.DataFrame) -> pd.DataFrame:
    name = s.groupby("series_id").size().idxmax()
    return s[s["series_id"] == name].reset_index(drop=True)


def profile(label: str, fn, *args, reps: int = 1, **kw):
    # warm numpy/etc
    t0 = time.perf_counter()
    fn(*args, **kw)
    wall = time.perf_counter() - t0
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        fn(*args, **kw)
    pr.disable()
    buf = io.StringIO()
    stats = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
    stats.print_stats(18)
    print(f"\n===== {label}: wall {wall:.3f}s/series (untraced) =====")
    print("\n".join(buf.getvalue().splitlines()[:34]))
    return wall


def main() -> None:
    which = set(sys.argv[1:]) or {"all"}
    s = load_series()
    g = one_series(s)
    print(f"series '{g.series_id.iloc[0]}', {len(g)} rows")

    from time_series_data_anomaly_detection_spark.functions import kalman as K

    if which & {"all", "kalman_em"}:
        def run_kalman_em(pdf):
            y = pdf["value"].to_numpy(float)
            return K._kalman_em_local_level(y[: max(int(len(y) * 0.5), 2)])
        profile("kalman_em (train_frac=0.5, 30 EM iters)", run_kalman_em, g)

    if which & {"all", "kalman_fixed"}:
        def run_kalman_fixed(pdf):
            y = pdf["value"].to_numpy(float)
            n = len(y)
            pm = np.empty(n); pvp = np.empty(n)
            m, p = float(y[0]), 10.0
            qv, rv = 0.1, 1.0
            for t in range(n):
                pp = p + qv
                pm[t] = m
                pvp[t] = pp + rv
                k = pp / (pp + rv)
                m = m + k * (y[t] - m)
                p = (1.0 - k) * pp
            return pm, pvp
        profile("kalman_fixed scalar loop (shape mirror)", run_kalman_fixed, g)

    if which & {"all", "bsts_dummy"}:
        def run_bsts_dummy(pdf):
            fn = _grouped_fn(K.bsts_forecast, period=24, train_frac=0.5)
            return fn(pdf)
        profile("bsts_forecast dummy period=24 (dim=25)", run_bsts_dummy, g)

    if which & {"all", "bsts_multi"}:
        def run_bsts_multi(pdf):
            fn = _grouped_fn(
                K.bsts_forecast, period=24, train_frac=0.5,
                seasonal_periods=[48, 336],
            )
            return fn(pdf)
        profile("bsts_forecast trig [48,336] (dim=42)", run_bsts_multi, g)

    if which & {"all", "bocpd"}:
        from time_series_data_anomaly_detection_spark.functions import bocpd as B
        def run_bocpd(pdf):
            y = pdf["value"].to_numpy(float)
            sd = y.std() or 1.0
            z = (y - y.mean()) / sd
            return B.bocpd_series(z)
        profile("bocpd_series (hazard 100, max_run 500)", run_bocpd, g)

    if which & {"all", "lstm"}:
        from time_series_data_anomaly_detection_spark.functions import lstm as L
        def run_lstm(pdf):
            fn = _grouped_fn(
                L.lstm_forecast, seq_len=48, hidden=24, epochs=6, batch=96,
                train_frac=0.5, max_train_windows=1500, lr=3e-3,
            )
            return fn(pdf)
        profile("lstm_forecast (h24 e6 b96 w1500)", run_lstm, g)

    if which & {"all", "gp"}:
        from time_series_data_anomaly_detection_spark.functions import gp as G
        def run_gp(pdf):
            y = pdf["value"].to_numpy(float)
            n = len(y)
            n_train = max(int(n * 0.5), 2)
            lo = max(n_train - 1000, 0)
            x_tr = np.arange(lo, n_train, dtype=float)
            y_tr = y[lo:n_train]
            mu, sd = float(y_tr.mean()), float(y_tr.std()) or 1.0
            yn = (y_tr - mu) / sd
            ls_fit, noise2 = G._select_hyperparams(x_tr, yn, 24.0, None, 50.0, 0.1)
            Kk = G._kernel(x_tr, x_tr, 1.0, ls_fit, 24.0, 1.0, 1.0, None)
            Kk[np.diag_indices_from(Kk)] += noise2
            # one 2048-row bucket (the per-group work unit)
            x_star = np.arange(0, 2048, dtype=float)
            Ks = G._kernel(x_star, x_tr, 1.0, ls_fit, 24.0, 1.0, 1.0, None)
            sol = np.linalg.solve(Kk, np.column_stack([yn, Ks.T]))
            mean = Ks @ sol[:, 0]
            var = (1.0 + 1.0 + 0.0 + noise2) - np.einsum("ij,ji->i", Ks, sol[:, 1:])
            return mean, var
        profile("gp fit+score one 2048-bucket (m=1000)", run_gp, g)

    if which & {"all", "stl"}:
        from time_series_data_anomaly_detection_spark.functions import stl as S
        def run_stl(pdf):
            fn = _grouped_fn(S.stl_decompose, period=24)
            return fn(pdf)
        profile("stl_decompose period=24", run_stl, g)


def _grouped_fn(op, **kw):
    """Extract the applyInPandas closure an operator builds, by calling
    the operator on a shim DataFrame that records the function."""
    captured = {}

    class _GB:
        def applyInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    class _DF:
        def select(self, *c):
            return self
        def withColumn(self, *a, **k):
            return self
        def filter(self, *a):
            return self
        def join(self, *a, **k):
            return self
        def groupBy(self, *c):
            return _GB()
        def groupby(self, *c):
            return _GB()

    import unittest.mock as um
    with um.patch(
        "time_series_data_anomaly_detection_spark.functions._partition."
        "udf_repartition",
        lambda df, *cols: df,
    ):
        try:
            op(_DF(), **kw)
        except Exception:
            pass
    fn = captured["fn"]
    return fn


if __name__ == "__main__":
    main()
