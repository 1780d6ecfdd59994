"""Round-13: attribute the acf/pacf warm drift (r12 verdict item #4 —
warm 2.2x/2.1x their r01 cells, the only §2 family above 2x
self-baseline).

Method: same-session A/B of the candidate causes, warm cells (second
execution of each plan), sf0.1:

  acf_current   the shipped operator — one window sort, max_lag lag()
                columns, stack, then FIVE exact decimal(38,12) sums
                per (series, lag) group (r04: F.corr's streaming
                co-moments are summation-order-dependent; the explicit
                decimal form is what makes the DuckDB hash gate
                bit-stable)
  acf_double    IDENTICAL plan shape, plain double sums — isolates
                the decimal-arithmetic premium
  acf_corr      identical shape, F.corr aggregate — the r01 aggregate
                on today's (better) window+stack frame
  acf_r01_join  the r01 plan verbatim: explode a lag grid, self-join
                on rn-lag=prn, F.corr — what the r01 bench actually
                timed
  pacf_current  shipped pacf (Durbin-Levinson column algebra over the
                acf pivot — inherits acf's aggregate)

The r01 bench cell is NOT directly comparable to today's operator:
it timed acf_r01_join's weaker algebra.  Whatever acf_current −
acf_double shows is the price of hash-exact decimal sums; acf_double
vs acf_r01_join shows the plan-shape win that partially pays for it.

Usage: python scripts/r13_acf_profile.py   (prints a JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.plans import registry

    spark = get_spark(app_name="r13-acf-profile")
    spark.sparkContext.setLogLevel("ERROR")

    series = registry._series(spark, SF)
    max_lag = 10

    def window_stack_frame():
        w = Window.partitionBy("series_id").orderBy("rn")
        shifts = [
            F.lag("value", k).over(w).alias(f"__p{k}")
            for k in range(1, max_lag + 1)
        ]
        stack_args = ", ".join(f"{k}, __p{k}" for k in range(1, max_lag + 1))
        return (
            series.select("series_id", F.col("value").alias("__x"), *shifts)
            .selectExpr(
                "series_id", "__x",
                f"stack({max_lag}, {stack_args}) AS (lag, prev)",
            )
            .filter(F.col("prev").isNotNull())
        )

    def acf_double():
        shifted = window_stack_frame()
        x, y = F.col("__x"), F.col("prev")
        agg = shifted.groupBy("series_id", "lag").agg(
            F.count("*").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        num = n * F.col("sxy") - sx * sy
        den = F.sqrt(
            (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
        )
        return agg.select("series_id", "lag", (num / den).alias("acf"))

    def acf_corr():
        shifted = window_stack_frame()
        return shifted.groupBy("series_id", "lag").agg(
            F.corr("__x", "prev").alias("acf")
        )

    def acf_r01_join():
        lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
        tall = series.select("series_id", "rn", "value", lags)
        shifted = tall.alias("a").join(
            series.select(
                "series_id",
                F.col("rn").alias("prn"),
                F.col("value").alias("prev"),
            ).alias("b"),
            on=[
                F.col("a.series_id") == F.col("b.series_id"),
                F.col("a.rn") - F.col("a.lag") == F.col("b.prn"),
            ],
            how="inner",
        )
        return shifted.groupBy(
            F.col("a.series_id").alias("series_id"), "lag"
        ).agg(F.corr(F.col("a.value"), F.col("prev")).alias("acf"))

    qs = registry.queries()
    variants = {
        "acf_current": lambda: qs["acf"](spark, SF),
        "acf_double": acf_double,
        "acf_corr": acf_corr,
        "acf_r01_join": acf_r01_join,
        "pacf_current": lambda: qs["pacf"](spark, SF),
    }
    out = {}
    for name, fn in variants.items():
        cells = []
        for _ in range(3):  # first-pass + two warm cells
            t = time.time()
            fn().write.format("noop").mode("overwrite").save()
            cells.append(round(time.time() - t, 2))
        out[name] = {"first": cells[0], "warm": min(cells[1:])}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
