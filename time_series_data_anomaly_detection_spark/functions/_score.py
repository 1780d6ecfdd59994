"""In-UDF robust scoring shared by the model grouped-maps.

Identical math to ``operators.scaling.mad_scores`` (exact medians,
``1.4826`` consistency constant, ``1e-9`` epsilon — ``src/utils.py:
31-38``, ``src/run_hybrid.py:41-42``), computed on the pandas group the
model UDF already holds.  Fusing the score into the fit pass removes
the 4 aggregate/join stage waves mad_scores costs per call — at bench
scale those fixed stage latencies dominate the actual math.
"""

from __future__ import annotations

import numpy as np

MAD_K = 1.4826
EPS = 1e-9


def mad_z(resid: np.ndarray) -> np.ndarray:
    """|x − median| / (1.4826·MAD + 1e-9) over non-NaN values; NaN in →
    NaN out (Arrow maps them to SQL nulls at the UDF boundary)."""
    r = resid[~np.isnan(resid)]
    if len(r) == 0:
        return np.full_like(resid, np.nan)
    med = np.median(r)
    mad = np.median(np.abs(r - med))
    return np.abs(resid - med) / (MAD_K * mad + EPS)
