"""Matrix profile + discord discovery (Yeh et al., ICDM 2016 "Matrix
Profile I"; Zhu et al. 2016 "Matrix Profile II" STOMP — public).

The matrix profile ``MP[i]`` is the z-normalized Euclidean distance
from window ``i`` to its nearest non-trivial neighbor window.  High MP
= the window is unlike every other window = a DISCORD — the classic
shape-anomaly notion that pointwise detectors (z-score/MAD/SR) miss:
a normal-valued but wrong-SHAPED day scores high here and nowhere else.

Implementation per series (one ``applyInPandas`` task) — STOMP:

- Row 0's sliding dot products by direct correlation (O(n·m), m is
  small), then each subsequent row from the previous via the O(k)
  vectorized recurrence
  ``QT[i, 1:] = QT[i-1, :-1] - x[i-1]·x[:k-1] + x[i+m-1]·x[m:m+k-1]``
  — O(n²) total work but one numpy pass per row, no n×n matrix and no
  FFT batches (at m ≪ n the FFT constant loses to the recurrence).
- Rolling mean/std via cumulative sums; z-norm distance from the
  dot-product identity
  ``d² = 2m (1 - (qt - m·μ_q·μ_t) / (m·σ_q·σ_t))``.
- Trivial-match exclusion zone of ``m/2`` around the diagonal.

Degenerate (near-constant) windows — σ below a RELATIVE tolerance —
are special-cased explicitly rather than σ-clamped (clamping divides
the recurrence's accumulated rounding error by ~1e-12 and manufactures
spurious zero-distance neighbors on low-variance data): constant vs
constant compares as distance 0, constant vs non-constant as
``sqrt(2m)`` (the ρ=0 limit), the STUMPY-style convention.

Scale: series are independent tasks; state is O(k) (one row of the
profile), never O(k²).  For 100 TB the documented path for very long
series is per-segment profiles with boundary overlap merged by min —
same output schema, same task shape.

Rows-only gate (sequential recurrence, non-SQL); the unit test plants
a shape discord in a periodic series and asserts it ranks first, and
cross-checks the profile against a naive O(n²·m) reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MP_SCHEMA = (
    "series_id string, rn long, mp double, nn_idx long, is_discord int"
)

EPS = 1e-12
# relative σ tolerance marking a window as (near-)constant — the scale
# guard is max(1, |μ|) so tiny-mean series don't flip to absolute units
CONST_TOL = 1e-7


def _rolling_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    c = np.cumsum(np.concatenate([[0.0], x]))
    c2 = np.cumsum(np.concatenate([[0.0], x * x]))
    s1 = c[m:] - c[:-m]
    s2 = c2[m:] - c2[:-m]
    mu = s1 / m
    var = np.maximum(s2 / m - mu * mu, 0.0)
    return mu, np.sqrt(var)


def matrix_profile_one(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (mp, nn_idx) for all n-m+1 windows of one series (STOMP)."""
    n = len(x)
    k = n - m + 1
    mu, sig = _rolling_stats(x, m)
    const = sig <= CONST_TOL * np.maximum(1.0, np.abs(mu))
    sig_safe = np.where(const, 1.0, sig)
    excl = max(1, m // 2)

    mp = np.empty(k)
    nn = np.empty(k, dtype=np.int64)

    # row 0: direct sliding dot products (m << n makes this cheap)
    qt = np.correlate(x, x[:m], mode="valid")  # length k
    qt_first = qt.copy()  # QT[i, 0] = QT[0, i] by symmetry
    for i in range(k):
        if i > 0:
            qt[1:] = qt[:-1] - x[i - 1] * x[: k - 1] + x[i + m - 1] * x[m : m + k - 1]
            qt[0] = qt_first[i]
        if const[i]:
            # constant query: 0 to other constant windows, sqrt(2m)
            # (ρ=0 limit) to everything else — never divide by σ
            dist2 = np.where(const, 0.0, 2.0 * m)
        else:
            dist2 = 2.0 * m * (
                1.0 - (qt - m * mu[i] * mu) / (m * sig_safe[i] * sig_safe)
            )
            dist2[const] = 2.0 * m
        dist2[max(0, i - excl) : i + excl + 1] = np.inf
        j = int(np.argmin(dist2))
        nn[i] = j
        mp[i] = np.sqrt(max(dist2[j], 0.0)) if np.isfinite(dist2[j]) else np.inf
    return mp, nn


def matrix_profile_scores(
    df: DataFrame, m: int = 24, top_discords: int = 3
) -> DataFrame:
    """Per-series matrix profile over ``(series_id, rn, value)``;
    ``is_discord`` marks the ``top_discords`` highest-profile windows
    (greedy, with an m-wide exclusion between picks)."""

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2 * m:
            return pd.DataFrame(
                columns=["series_id", "rn", "mp", "nn_idx", "is_discord"]
            ).astype(
                {
                    "series_id": "object", "rn": "int64", "mp": "float64",
                    "nn_idx": "int64", "is_discord": "int32",
                }
            )
        mp, nn = matrix_profile_one(x, m)
        k = len(mp)
        discord = np.zeros(k, dtype=np.int32)
        masked = mp.copy()
        masked[~np.isfinite(masked)] = -np.inf
        for _ in range(top_discords):
            i = int(np.argmax(masked))
            if not np.isfinite(masked[i]) or masked[i] < 0:
                break
            discord[i] = 1
            lo, hi = max(0, i - m), min(k, i + m + 1)
            masked[lo:hi] = -np.inf
        rn = pdf["rn"].to_numpy()[:k]
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].to_numpy()[:k],
                "rn": rn,
                "mp": np.where(np.isfinite(mp), mp, -1.0),
                "nn_idx": nn + 1,  # report as 1-based rn of the neighbor
                "is_discord": discord,
            }
        )

    return (
        df.select("series_id", "rn", "value")
        .groupBy("series_id")
        .applyInPandas(_one, MP_SCHEMA)
    )
