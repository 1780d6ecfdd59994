"""Distributional / dependence statistical tests, fully native.

Completes the test family around Mann-Kendall/Theil-Sen
(``operators/trend.py``): the reference eyeballs random-walk-vs-mean-
reversion structure through ACF plots (``notebooks/01`` ACF/PACF
cells, ``src/plotting.py``); the variance-ratio test (Lo & MacKinlay
1988) is the standard FORMAL test for it, and it is pure moment
algebra — exactly the shape a SQL engine executes well.

``VR(q) = Var(x_t − x_{t−q}) / (q · Var(x_t − x_{t−1}))`` computed
over overlapping q-period differences; 1 for a random walk, < 1 for
mean reversion, > 1 for trending/momentum.  The asymptotic z-statistic
``(VR − 1)/sqrt(2(2q−1)(q−1)/(3qn))`` uses only rational arithmetic
plus one sqrt — identical IEEE on both engines.

Cross-engine exactness: both difference columns are exact lags of the
raw values; all variance sums run in DECIMAL(38,12) (order
independent); every downstream expression is a fixed tree over
identical doubles.

Scale shape: one series-partition window pass producing the q+1 lag
columns, one per-series aggregate (tiny, q rows per series).  O(n)
work; 100 TB axis is series count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC


def variance_ratio(
    df: DataFrame,
    value_col: str = "value",
    qs: tuple[int, ...] = (2, 4, 8),
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test at horizons ``qs``.

    Returns one row per (series_id, q): ``n`` (count of 1-period
    diffs), ``var1``, ``varq`` (sample variances, ddof=1), ``vr``,
    and the asymptotic ``z`` statistic.
    """
    v = F.col(value_col)
    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = Window.partitionBy("series_id").orderBy(*(order or ["rn"]))

    d1 = (v - F.lag(v, 1).over(w)).alias("__d1")
    base = df.select(
        "series_id",
        d1,
        *[(v - F.lag(v, q).over(w)).alias(f"__d{q}") for q in qs],
    )

    def _var(col: str, n: F.Column) -> F.Column:
        c = F.col(col)
        s1 = F.sum(c.cast(DEC)).cast("double")
        s2 = F.sum((c * c).cast(DEC)).cast("double")
        return (s2 - s1 * s1 / n) / (n - 1)

    # ONE aggregate computes every horizon's moments (single shuffle,
    # single window evaluation), then an explode unpivots to rows
    agg = base.groupBy("series_id").agg(
        F.count("__d1").alias("n"),
        _var("__d1", F.count("__d1")).alias("var1"),
        *[
            _var(f"__d{q}", F.count(f"__d{q}")).alias(f"varq_{q}")
            for q in qs
        ],
    )
    rows = agg.select(
        "series_id",
        "n",
        "var1",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.col(f"varq_{q}").alias("varq"),
                    )
                    for q in qs
                ]
            )
        ).alias("qe"),
    ).select("series_id", "n", "var1", "qe.q", "qe.varq")
    vr = F.col("varq") / (F.col("q") * F.col("var1"))
    z = (vr - F.lit(1.0)) / F.sqrt(
        (2.0 * (2.0 * F.col("q") - 1.0) * (F.col("q") - 1.0))
        / (3.0 * F.col("q") * F.col("n"))
    )
    return rows.select(
        "series_id", "q", "n", "var1", "varq",
        vr.alias("vr"), z.alias("z"),
    )


def rs_analysis(
    df: DataFrame,
    value_col: str = "value",
    scales: tuple[int, ...] = (64, 256),
) -> DataFrame:
    """Rescaled-range (R/S) analysis (Hurst 1951; Mandelbrot & Wallis
    1969) — the long-memory diagnostic beside the variance-ratio test:
    for each block of ``s`` consecutive rows, ``R`` is the range of the
    mean-adjusted cumulative deviations and ``S`` the population std;
    ``E[R/S] ∝ s^H`` with Hurst exponent H (0.5 = no memory, > 0.5 =
    persistent).  The per-scale means are emitted; the H estimate is
    ``log(rs_ratio)/log(scale_ratio)`` driver-side (kept OUT of the
    gated output — cross-engine ``log`` is not bit-stable).

    Returns one row per (series_id, scale): ``n_blocks``, ``rs_mean``
    plus the building blocks.  Only COMPLETE blocks participate.

    Cross-engine exactness: block cumulative sums and moments run in
    DECIMAL(38,12); Z, R, S are fixed expressions over identical
    doubles; the block-mean of R/S is decimal-accumulated.

    Scale shape: per scale, one (series, block) partition window + two
    tiny aggregates; blocks tables are rows/s ≪ input.  100 TB axis:
    series × blocks, embarrassingly parallel.
    """
    v = F.col(value_col)
    parts = []
    for s in scales:
        blk = df.select(
            "series_id",
            "rn",
            v.alias("__v"),
            F.floor((F.col("rn") - 1) / F.lit(int(s))).alias("__b"),
        )
        w = Window.partitionBy("series_id", "__b").orderBy("rn")
        cum = blk.withColumn(
            "__c", F.sum(F.col("__v").cast(DEC)).over(w).cast("double")
        ).withColumn(
            "__pos", F.col("rn") - F.col("__b") * F.lit(int(s))
        )
        bstats = blk.groupBy("series_id", "__b").agg(
            F.count("*").alias("__n"),
            F.sum(F.col("__v").cast(DEC)).cast("double").alias("__s1"),
            F.sum((F.col("__v") * F.col("__v")).cast(DEC))
            .cast("double")
            .alias("__s2"),
        )
        bstats = bstats.filter(F.col("__n") == int(s)).select(
            "series_id",
            "__b",
            (F.col("__s1") / F.col("__n")).alias("__m"),
            F.sqrt(
                F.greatest(
                    (
                        F.col("__s2")
                        - F.col("__s1") * F.col("__s1") / F.col("__n")
                    )
                    / F.col("__n"),
                    F.lit(0.0),
                )
            ).alias("__sd"),
        )
        z = cum.join(F.broadcast(bstats), ["series_id", "__b"]).select(
            "series_id",
            "__b",
            "__sd",
            (F.col("__c") - F.col("__pos") * F.col("__m")).alias("__z"),
        )
        rng = z.groupBy("series_id", "__b").agg(
            (F.max("__z") - F.min("__z")).alias("__r"),
            F.first("__sd").alias("__sd"),
        )
        rs = rng.select(
            "series_id",
            "__b",
            (F.col("__r") / (F.col("__sd") + F.lit(1e-9))).alias("__rs"),
        )
        parts.append(
            rs.groupBy("series_id")
            .agg(
                F.count("*").alias("n_blocks"),
                (
                    F.sum(F.col("__rs").cast(DEC)).cast("double")
                    / F.count("*")
                ).alias("rs_mean"),
            )
            .select(
                "series_id",
                F.lit(int(s)).alias("scale"),
                "n_blocks",
                "rs_mean",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("series_id", "scale", "n_blocks", "rs_mean")


def ks_drift(
    df: DataFrame,
    value_col: str = "value",
    train_frac: float = 0.7,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the positional
    train and test splits — the classical statistic behind the decile
    TVD retrain trigger (``split_drift``): ``D = max_v |F_train(v) −
    F_test(v)|`` over the pooled sample points, with the α=0.05
    rejection flag ``D > 1.358·sqrt((n1+n2)/(n1·n2))``.

    Fully native and exact: per-(series, value) split counts, one
    value-ordered cumulative window, integer cumulative counts divided
    by integer split sizes — identical doubles cross-engine; the
    argmax value is tie-broken smallest.

    Returns one row per series: ``n_train, n_test, ks, ks_at, flag``.

    Scale shape: one (series, value) aggregate + one value-ordered
    window on the DISTINCT-value table (≤ rows), one argmax filter.
    """
    v = F.col(value_col)
    counts = df.groupBy("series_id").agg(F.max("rn").alias("__n"))
    base = df.join(F.broadcast(counts), "series_id").withColumn(
        "__tr",
        (F.col("rn") <= F.floor(F.col("__n") * F.lit(float(train_frac))))
        .cast("long"),
    )
    per_val = base.groupBy("series_id", v.alias("val")).agg(
        F.sum("__tr").alias("c_tr"),
        F.sum(F.lit(1) - F.col("__tr")).alias("c_te"),
    )
    wv = (
        Window.partitionBy("series_id")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = per_val.groupBy("series_id").agg(
        F.sum("c_tr").alias("n_train"), F.sum("c_te").alias("n_test")
    )
    ecdf = (
        per_val.withColumn("F_tr", F.sum("c_tr").over(wv))
        .withColumn("F_te", F.sum("c_te").over(wv))
        .join(F.broadcast(tot), "series_id")
        .withColumn(
            "d",
            F.abs(
                F.col("F_tr") / F.col("n_train")
                - F.col("F_te") / F.col("n_test")
            ),
        )
    )
    wr = Window.partitionBy("series_id").orderBy(
        F.desc("d"), F.asc("val")
    )
    top = ecdf.withColumn("__r", F.row_number().over(wr)).filter(
        F.col("__r") == 1
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n_train") + F.col("n_test"))
        / (F.col("n_train") * F.col("n_test")).cast("double")
    )
    return top.select(
        "series_id",
        "n_train",
        "n_test",
        F.col("d").alias("ks"),
        F.col("val").alias("ks_at"),
        (F.col("d") > crit).cast("int").alias("flag"),
    )


def cusum_squares(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Inclán-Tiao CUSUM-of-squares test (JASA 1994) — the VARIANCE
    changepoint locator beside the mean-shift charts (CUSUM/PH):
    ``D_k = C_k/C_n − k/n`` over the cumulative sum of squares; the
    max |D_k| locates a variance change, and ``sqrt(n/2)·max|D|``
    exceeds 1.358 at α=0.05 under homoskedasticity.

    Exact: decimal cumulative x² sums; D is a fixed expression over
    identical doubles; argmax tie-broken smallest rn.

    Returns one row per series: ``k_hat, d_abs_max, it_stat, flag``.

    Scale shape: the shared series window (one exchange) + one argmax
    filter; O(n) with O(1) per-row state.
    """
    v = F.col(value_col)
    order = [c for c in ("timestamp", "event_id") if c in df.columns]
    w = (
        Window.partitionBy("series_id")
        .orderBy(*(order or ["rn"]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = df.groupBy("series_id").agg(
        F.count(value_col).alias("__n"),
        F.sum((v * v).cast(DEC)).cast("double").alias("__cn"),
    )
    d = (
        df.withColumn(
            "__ck", F.sum((v * v).cast(DEC)).over(w).cast("double")
        )
        .join(F.broadcast(tot), "series_id")
        .withColumn(
            "__d",
            F.abs(
                F.col("__ck") / F.col("__cn")
                - F.col("rn") / F.col("__n")
            ),
        )
    )
    wr = Window.partitionBy("series_id").orderBy(
        F.desc("__d"), F.asc("rn")
    )
    top = d.withColumn("__r", F.row_number().over(wr)).filter(
        F.col("__r") == 1
    )
    it = F.sqrt(F.col("__n") / F.lit(2.0)) * F.col("__d")
    return top.select(
        "series_id",
        F.col("rn").alias("k_hat"),
        F.col("__d").alias("d_abs_max"),
        it.alias("it_stat"),
        (it > F.lit(1.358)).cast("int").alias("flag"),
    )


def ljung_box(
    df: DataFrame,
    value_col: str = "value",
    max_lag: int = 10,
    crit: float = 18.307,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test (Ljung & Box 1978) — the
    standard residual diagnostic after every forecast fit the
    reference runs (statsmodels ``acorr_ljungbox``)::

        Q = n(n+2) Σ_{k=1..h} ρ_k² / (n−k)

    with ρ from the statsmodels ACF estimator (the hash-gated
    ``acf_statsmodels``).  ``crit`` defaults to χ²₁₀ at α=0.05
    (18.307) for h=10.

    Returns one row per series: ``n, q_stat, flag`` (flag=1 ⇒ reject
    whiteness).  The per-lag terms are decimal-accumulated so the
    10-term sum is order-independent cross-engine.

    Scale shape: the gated ACF DAG (stack + one aggregate) plus one
    10-row-per-series rollup — nothing new.
    """
    from .acf import acf_statsmodels

    rho = acf_statsmodels(df, max_lag=max_lag, value_col=value_col)
    n_tab = df.groupBy("series_id").agg(F.count(value_col).alias("n"))
    terms = rho.join(F.broadcast(n_tab), "series_id").select(
        "series_id",
        "n",
        (
            (F.col("acf") * F.col("acf")) / (F.col("n") - F.col("lag"))
        ).alias("__t"),
    )
    out = terms.groupBy("series_id").agg(
        F.first("n").alias("n"),
        (
            F.first("n")
            * (F.first("n") + F.lit(2.0))
            * F.sum(F.col("__t").cast(DEC)).cast("double")
        ).alias("q_stat"),
    )
    return out.select(
        "series_id",
        "n",
        "q_stat",
        (F.col("q_stat") > F.lit(float(crit))).cast("int").alias("flag"),
    )


def runs_test(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness about the median —
    the nonparametric companion to Ljung-Box (detects sign clustering
    that autocorrelation coefficients can miss)::

        z = (R − E[R]) / sqrt(Var[R]),
        E[R] = 2·n1·n2/(n1+n2) + 1

    over the sign sequence of ``value − median`` (median ties
    dropped, the classical convention).  Everything is integer
    counting + one rational expression + one sqrt — hash-exact.

    Returns one row per series: ``n1, n2, n_runs, z, flag``
    (flag=1 ⇒ |z| > 1.96, nonrandom at α=0.05).

    Scale shape: exact median aggregate (broadcast) + one series
    window pass for the run boundaries + one rollup.
    """
    v = F.col(value_col)
    med = df.groupBy("series_id").agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    signed = (
        df.join(F.broadcast(med), "series_id")
        .filter(v != F.col("__med"))
        .withColumn("__s", (v > F.col("__med")).cast("int"))
    )
    w = Window.partitionBy("series_id").orderBy("rn")
    runs = signed.withColumn(
        "__chg",
        F.when(
            F.lag("__s").over(w).isNull()
            | (F.col("__s") != F.lag("__s").over(w)),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy("series_id").agg(
        F.sum("__s").alias("n1"),
        F.sum(F.lit(1) - F.col("__s")).alias("n2"),
        F.sum("__chg").alias("n_runs"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("n_runs")
    nn = n1 + n2
    e_r = 2.0 * n1 * n2 / nn + 1.0
    var_r = (
        (2.0 * n1 * n2) * (2.0 * n1 * n2 - n1 - n2)
        / (nn * nn * (nn - 1)).cast("double")
    )
    z = (r - e_r) / F.sqrt(var_r + F.lit(1e-30))
    return agg.select(
        "series_id",
        "n1",
        "n2",
        "n_runs",
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).cast("int").alias("flag"),
    )
