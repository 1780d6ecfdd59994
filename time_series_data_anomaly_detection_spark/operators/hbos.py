"""HBOS — histogram-based outlier scoring (Goldstein & Dengel 2012),
the density-estimation detector beside the distance (Hampel), quantile
(band), and model-residual (AR/Kalman) families.

The reference scores anomalies with model residuals and MAD z-scores
(``src/utils.py:31-72``); HBOS is the standard non-parametric
complement for multimodal marginals where a single center+scale is
wrong (a two-regime series makes every z-rule fire on the smaller
regime).  Classic single-feature HBOS scores ``-log(density(bin))``;
this implementation keeps the identical ordering but a RATIONAL form
so the gate can hash it bit-exactly cross-engine:

    rarity = n / (n_bins * bin_count)     (uniform histogram => 1.0)

which is a monotone transform of inverse density — the integers
``n``/``bin_count`` are exact on any engine and the single double
division is IEEE-identical, so no transcendental drift can flip the
hash (house rule, see ``corpus_drift``).

Spark shape: one tiny per-series (min, max, n) aggregate broadcast
back, a pure-projection bin assignment, one (series, bin) count
aggregate broadcast back — the scan stays a single pass, no UDF, and
the histogram table is |series|·n_bins rows at ANY data size.  At
100 TB the exact min/max are fine (associative); everything else is
O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hbos_flags(
    df: DataFrame,
    value_col: str = "value",
    n_bins: int = 20,
    rarity_thresh: float = 8.0,
) -> DataFrame:
    """Equal-width histogram rarity per row: bin each value into
    ``n_bins`` bins over the per-series [min, max] range, score each
    row by its bin's inverse relative density, and flag rows whose bin
    is ``rarity_thresh``× rarer than uniform.

    Flag compare is INTEGER (``n > thresh * n_bins * bin_n`` with an
    integral ``thresh``-scaled literal) — no float boundary at all.

    Adds ``bin``, ``bin_n``, ``rarity``, ``hbos_flag``.  Degenerate
    (constant) series land in bin 0 with rarity 1/n_bins·n/n = 1 — no
    flags, by construction.
    """
    v = F.col(value_col)
    rng = df.groupBy("series_id").agg(
        F.min(v).alias("__vmin"),
        F.max(v).alias("__vmax"),
        F.count(v).alias("__n"),
    )
    b = df.join(F.broadcast(rng), "series_id").withColumn(
        "bin",
        F.when(F.col("__vmax") == F.col("__vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (v - F.col("__vmin"))
                    / (F.col("__vmax") - F.col("__vmin"))
                    * F.lit(float(n_bins))
                ),
            )
        )
        .cast("int"),
    )
    hist = b.groupBy("series_id", "bin").agg(
        F.count("*").alias("bin_n")
    )
    out = b.join(F.broadcast(hist), ["series_id", "bin"])
    rarity = F.col("__n") / (F.lit(float(n_bins)) * F.col("bin_n"))
    return (
        out.withColumn("rarity", rarity)
        .withColumn(
            "hbos_flag",
            (
                F.col("__n")
                > F.lit(float(rarity_thresh) * n_bins) * F.col("bin_n")
            ).cast("int"),
        )
        .drop("__vmin", "__vmax", "__n")
    )
