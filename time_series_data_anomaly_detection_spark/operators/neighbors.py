"""Distance- and density-based value-space detectors, fully native.

Two classical unsupervised outlier families the reference approximates
with z-scores (``src/utils.py:31-38`` MAD, ``src/run_hybrid.py:42``)
but never implements directly:

- ``knn_outlier`` — exact k-nearest-neighbor distance score (Ramaswamy
  et al. SIGMOD'00) in 1-D value space.  The 1-D structure collapses
  the O(n²) neighbor search: after sorting by value, every point's k
  nearest values are among its k predecessors and k successors in
  value order, so the whole computation is 2k ``lag``/``lead`` columns
  on ONE value-ordered window — no self-join, no index.
- ``kde_rarity`` — binned Epanechnikov KDE (Silverman §2.7 binned
  estimator): an integer histogram at bin width σ/8 smoothed by the
  parabolic kernel at bandwidth σ/2 (9 fixed bucket offsets).  The
  kernel-smoothed complement of HBOS's raw histogram score
  (``operators/hbos.py``), and O(n + B) instead of the O(n²·h/range)
  pairwise KDE — the binning IS the 100 TB design.

Cross-engine exactness: sorts/lags of identical doubles are identical;
the k=3 distance sum is spelled as a fixed 3-term expression (no
aggregate order); KDE bucket counts are integers, kernel weights are
fixed expressions of the exact-decimal σ, and the 9-term smoothing sum
runs through DECIMAL(38,12) (the house pattern for order-independent
double accumulation).

Scale shape: one series-partition exchange each (value-ordered for
kNN, bucket aggregate for KDE; the bucket table is ~8·range/σ rows per
series — broadcast-sized).  Parallelism axis: series × rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC


def knn_outlier(
    df: DataFrame,
    value_col: str = "value",
    k: int = 3,
    top_frac: float = 0.01,
) -> DataFrame:
    """Exact 1-D kNN outlier score: mean distance to the ``k`` nearest
    values within the series, plus the k-th distance, a dense rank by
    score, and a top-``top_frac`` flag.

    Returns ``series_id, rn, knn_score, kth_dist, score_rank, flag``.
    """
    v = F.col(value_col)
    wv = Window.partitionBy("series_id").orderBy(value_col, "rn")
    cands = F.array(
        *[F.lag(v, i).over(wv) for i in range(1, k + 1)],
        *[F.lead(v, i).over(wv) for i in range(1, k + 1)],
    )
    diffs = F.array_sort(
        F.transform(
            F.filter(cands, lambda c: c.isNotNull()),
            lambda c: F.abs(v - c),
        )
    )
    out = df.withColumn("__d", diffs)
    # fixed-order k-term sum (k=3 unrolled in the gate query/oracle)
    avail = F.least(F.lit(k), F.size("__d"))
    total = F.lit(0.0)
    for i in range(1, k + 1):
        total = total + F.when(
            F.lit(i) <= avail, F.element_at("__d", i)
        ).otherwise(F.lit(0.0))
    out = out.withColumn(
        "knn_score",
        F.when(avail > 0, total / avail.cast("double")),
    ).withColumn(
        "kth_dist",
        F.when(avail > 0, F.element_at("__d", avail.cast("int"))),
    )
    ws = Window.partitionBy("series_id").orderBy(
        F.desc("knn_score"), F.asc("rn")
    )
    n = F.count("*").over(Window.partitionBy("series_id"))
    out = out.withColumn("score_rank", F.rank().over(ws)).withColumn(
        "flag",
        (
            F.col("score_rank")
            <= F.greatest(F.lit(1), F.floor(n * F.lit(float(top_frac))))
        ).cast("int"),
    )
    return out.drop("__d")


def kde_rarity(
    df: DataFrame,
    value_col: str = "value",
    bin_frac: float = 0.125,
    bw_frac: float = 0.5,
    rare_factor: float = 0.25,
) -> DataFrame:
    """Binned Epanechnikov KDE rarity score.

    Histogram at bin width ``δ = bin_frac·σ``; density at each bin
    center ``c_m`` is ``Σ_{|j|≤J} cnt[m+j] · K(jδ/h) / (n·h)`` with
    ``h = bw_frac·σ``, ``K(u) = 0.75(1−u²)``, ``J = h/δ − 1`` (the
    kernel support edge is exactly 0 and dropped).  Rows are flagged
    when their bin's density falls below ``rare_factor`` of the
    uniform density ``1/(vmax−vmin)``.

    Returns ``series_id, rn, bin, density, flag``.
    """
    v = F.col(value_col)
    moments = df.groupBy("series_id").agg(
        F.count(value_col).alias("__n"),
        F.sum(v.cast(DEC)).cast("double").alias("__s1"),
        F.sum((v * v).cast(DEC)).cast("double").alias("__s2"),
        F.min(v).alias("__vmin"),
        F.max(v).alias("__vmax"),
    )
    sd = F.sqrt(
        F.greatest(
            (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n"))
            / (F.col("__n") - 1),
            F.lit(0.0),
        )
    )
    m = moments.select(
        "series_id",
        "__n",
        "__vmin",
        "__vmax",
        (sd * F.lit(float(bin_frac)) + F.lit(1e-9)).alias("__delta"),
        (sd * F.lit(float(bw_frac)) + F.lit(1e-9)).alias("__h"),
    )
    rows = df.join(F.broadcast(m), "series_id").withColumn(
        "bin",
        F.floor((v - F.col("__vmin")) / F.col("__delta")).cast("long"),
    )
    counts = rows.groupBy(
        "series_id", "bin", "__n", "__delta", "__h", "__vmin", "__vmax"
    ).agg(F.count("*").alias("cnt"))

    j_max = int(bw_frac / bin_frac) - 1  # kernel hits exactly 0 at J+1
    # smear each bin's count onto its neighbors, then sum per target
    # bin in DECIMAL (order-independent) — a tiny table convolution
    smeared = counts.select(
        "series_id",
        "__n",
        "__h",
        "__vmin",
        "__vmax",
        F.explode(
            F.array(*[F.lit(j) for j in range(-j_max, j_max + 1)])
        ).alias("j"),
        "bin",
        "cnt",
        "__delta",
    ).select(
        "series_id",
        "__n",
        "__h",
        "__vmin",
        "__vmax",
        (F.col("bin") + F.col("j")).alias("tbin"),
        (
            F.col("cnt")
            * (
                F.lit(0.75)
                * (
                    F.lit(1.0)
                    - (F.col("j") * F.col("__delta") / F.col("__h"))
                    * (F.col("j") * F.col("__delta") / F.col("__h"))
                )
            )
        ).alias("w"),
    )
    dens = smeared.groupBy("series_id", "tbin").agg(
        (
            F.sum(F.col("w").cast(DEC)).cast("double")
            / (F.first("__n") * F.first("__h"))
        ).alias("density"),
        (
            F.lit(float(rare_factor))
            / (F.first("__vmax") - F.first("__vmin") + F.lit(1e-9))
        ).alias("__rare_at"),
    )
    out = rows.select("series_id", "rn", "bin").join(
        F.broadcast(dens.withColumnRenamed("tbin", "bin")),
        ["series_id", "bin"],
    )
    return out.select(
        "series_id",
        "rn",
        "bin",
        "density",
        (F.col("density") < F.col("__rare_at")).cast("int").alias("flag"),
    )
