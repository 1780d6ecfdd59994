"""LSTM forecaster (SURVEY §2.9 M5) — torch-gated.

Reference: per-series 1→64-hidden ``nn.LSTM`` + Linear head trained on
48-step sliding windows (``src/lstm_model.py:32-91``).  torch is NOT
installed in this environment; the gate below activates the real
implementation when it is, and otherwise raises with a pointer to the
deterministic AR(p) stand-in (``functions.ar.ar_forecast``), which the
pipelines use as the M5 slot.
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
) -> DataFrame:
    """Per-series LSTM one-step-ahead prediction (torch required).

    Matches the reference's shapes: windows ``X[i] = y[i:i+seq_len]``,
    target ``y[i+seq_len]``; the first ``seq_len`` rows get null
    predictions (NaN-padding, ``src/run_lstm.py:69-71``).  Training is
    seeded per series for reproducibility-at-tolerance (SURVEY §5).
    """
    if not HAS_TORCH:
        raise NotImplementedError(
            "torch is not installed; use functions.ar.ar_forecast as the "
            "deterministic M5 stand-in"
        )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        y = pdf["value"].to_numpy(np.float32)
        n = len(y)
        mu, sd = float(y.mean()), float(y.std()) or 1.0
        z = (y - mu) / sd
        n_train = max(int(n * train_frac), seq_len + 2)
        torch.manual_seed(seed)
        X = np.lib.stride_tricks.sliding_window_view(z, seq_len)[:-1]
        t = z[seq_len:]
        X_tr = torch.tensor(X[: n_train - seq_len, :, None])
        y_tr = torch.tensor(t[: n_train - seq_len, None])
        model = nn.Sequential()
        lstm = nn.LSTM(1, hidden, batch_first=True)
        head = nn.Linear(hidden, 1)
        opt = torch.optim.Adam(list(lstm.parameters()) + list(head.parameters()), lr=1e-3)
        loss_fn = nn.MSELoss()
        for _ in range(epochs):
            opt.zero_grad()
            out, _ = lstm(X_tr)
            loss = loss_fn(head(out[:, -1]), y_tr)
            loss.backward()
            opt.step()
        with torch.no_grad():
            out, _ = lstm(torch.tensor(X[:, :, None]))
            preds = head(out[:, -1]).numpy().ravel()
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
