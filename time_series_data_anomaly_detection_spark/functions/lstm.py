"""LSTM forecaster (SURVEY §2.9 M5).

Reference: per-series 1→64-hidden ``nn.LSTM`` + Linear head trained on
48-step sliding windows (``src/lstm_model.py:32-91``).  Two backends:

- torch (when installed): mirrors the reference's stack directly.
- numpy (this environment): from-scratch LSTM with full BPTT + Adam
  (``functions/_lstm_numpy.py``) implementing the SAME architecture,
  loss, optimizer, and window semantics — M5 is a real model here, not
  a stand-in.

Both are seeded per call; training is stochastic-by-seed, so parity is
metric-level (SURVEY §5), and the query stays rows-only in the gate.
``max_train_windows`` caps the training set at the tail of the train
region (cost control in the spirit of the GP's P5 subsample — it
changes results and is therefore an explicit, documented knob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - torch absent in this environment
    import torch
    from torch import nn

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False

LSTM_SCHEMA = (
    "series_id string, timestamp timestamp, value double, rn long, "
    "pred_mean double, resid double"
)


def lstm_forecast(
    df: DataFrame,
    seq_len: int = 48,
    hidden: int = 64,
    epochs: int = 10,
    train_frac: float = 1.0,
    seed: int = 0,
    max_train_windows: int | None = None,
    backend: str = "auto",
    batch: int = 64,
    lr: float = 1e-3,
) -> DataFrame:
    """Per-series LSTM one-step-ahead prediction.

    Matches the reference's shapes: windows ``X[i] = y[i:i+seq_len]``,
    target ``y[i+seq_len]``; the first ``seq_len`` rows get null
    predictions (NaN-padding, ``src/run_lstm.py:69-71``); values are
    z-normalized with train moments and predictions inverse-transformed
    (``src/run_lstm.py:36-39,74``).  Training is seeded per series.
    """
    use_torch = backend == "torch" or (backend == "auto" and HAS_TORCH)
    if backend == "torch" and not HAS_TORCH:
        raise NotImplementedError("torch backend requested but not installed")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(np.float64)
        n = len(y)
        if n <= seq_len:
            # shorter than one window: the reference NaN-pads the whole
            # series; without this guard sliding_window_view raises and
            # kills every series in the query
            pdf["pred_mean"] = np.nan
            pdf["resid"] = np.nan
            return pdf[
                ["series_id", "timestamp", "value", "rn", "pred_mean", "resid"]
            ]
        mu, sd = float(y.mean()), float(y.std()) or 1.0
        z = (y - mu) / sd
        n_train = max(int(n * train_frac), seq_len + 2)
        X = np.lib.stride_tricks.sliding_window_view(z, seq_len)[:-1]
        t = z[seq_len:]
        lo = 0
        hi = n_train - seq_len
        if max_train_windows is not None:
            lo = max(hi - max_train_windows, 0)
        X_tr, y_tr = X[lo:hi, :, None], t[lo:hi]
        if use_torch:  # pragma: no cover
            torch.manual_seed(seed)
            lstm = nn.LSTM(1, hidden, batch_first=True)
            head = nn.Linear(hidden, 1)
            opt = torch.optim.Adam(
                list(lstm.parameters()) + list(head.parameters()), lr=lr
            )
            loss_fn = nn.MSELoss()
            Xt = torch.tensor(X_tr, dtype=torch.float32)
            yt = torch.tensor(y_tr[:, None], dtype=torch.float32)
            for _ in range(epochs):
                opt.zero_grad()
                out, _ = lstm(Xt)
                loss = loss_fn(head(out[:, -1]), yt)
                loss.backward()
                opt.step()
            with torch.no_grad():
                out, _ = lstm(torch.tensor(X[:, :, None], dtype=torch.float32))
                preds = head(out[:, -1]).numpy().ravel().astype(np.float64)
        else:
            from ._lstm_numpy import NumpyLSTM

            model = NumpyLSTM(hidden, seed=seed)
            model.fit(X_tr, y_tr, epochs=epochs, batch=batch, seed=seed, lr=lr)
            preds = model.predict(X[:, :, None])
        full = np.full(n, np.nan)
        full[seq_len:] = preds * sd + mu
        pdf["pred_mean"] = full
        pdf["resid"] = pdf["value"] - pdf["pred_mean"]
        return pdf[["series_id", "timestamp", "value", "rn", "pred_mean", "resid"]]

    from ._partition import udf_repartition

    return (
        udf_repartition(df.select("series_id", "timestamp", "value", "rn"), "series_id")
        .groupBy("series_id")
        .applyInPandas(fit, LSTM_SCHEMA)
    )
