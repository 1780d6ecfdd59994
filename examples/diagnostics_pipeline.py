"""Series-diagnostics walkthrough: the "what is this data" pass that
precedes model choice — grid health, dominant period, trend decision,
quantile profile, then three model-free detectors (spectral residual,
matrix-profile discords, S-H-ESD) cross-checked against each other
and calibrated to a false-positive budget.

Usage: python examples/diagnostics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_anomaly_detection_spark import get_spark  # noqa: E402
from time_series_data_anomaly_detection_spark.functions.matrix_profile import (  # noqa: E402
    matrix_profile_scores,
)
from time_series_data_anomaly_detection_spark.functions.shesd import (  # noqa: E402
    shesd_flags,
)
from time_series_data_anomaly_detection_spark.functions.spectral import (  # noqa: E402
    spectral_residual_scores,
)
from time_series_data_anomaly_detection_spark.operators.diagnostics import (  # noqa: E402
    detect_period_frame,
    gap_stats_frame,
)
from time_series_data_anomaly_detection_spark.operators.scaling import (  # noqa: E402
    empirical_pvalues,
    mad_scores,
)
from time_series_data_anomaly_detection_spark.operators.trend import (  # noqa: E402
    mann_kendall_frame,
)
from time_series_data_anomaly_detection_spark.sources import (  # noqa: E402
    events_as_series,
    with_row_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-diagnostics")
    spark.sparkContext.setLogLevel("ERROR")

    series = with_row_index(events_as_series(spark, sf_dir))

    # 1. grid health: is the time grid complete enough for row-frame
    #    windows, and what is the dominant period?
    print("== gap report ==")
    gap_stats_frame(series).show()
    print("== dominant period (argmax ACF) ==")
    period = detect_period_frame(series, max_lag=60)
    period.show()

    # 2. trend decision: Mann-Kendall z + Theil-Sen slope per series
    print("== trend test ==")
    mann_kendall_frame(series).select(
        "series_id", "n", "z", "sen_slope", "trend"
    ).show()

    # 3. distribution profile: quantiles drive threshold choices
    print("== MAD scores calibrated to empirical p-values ==")
    calibrated = empirical_pvalues(mad_scores(series))
    calibrated.where(F.col("p_emp") <= 0.01).groupBy("series_id").count().show()

    # 4. three model-free detectors, each seeing what the others miss:
    #    SR = salient points, MP = anomalous SHAPES, S-H-ESD = a
    #    statistically-sized anomaly set after seasonal removal
    sr = spectral_residual_scores(series).where(F.col("flag") == 1)
    mp = matrix_profile_scores(series, m=24).where(F.col("is_discord") == 1)
    esd = shesd_flags(series, period=24).where(F.col("anomaly") == 1)

    print("== detector hit counts per series ==")
    counts = (
        sr.groupBy("series_id").agg(F.count("*").alias("sr_hits"))
        .join(
            mp.groupBy("series_id").agg(F.count("*").alias("mp_discords")),
            "series_id", "outer",
        )
        .join(
            esd.groupBy("series_id").agg(F.count("*").alias("shesd_hits")),
            "series_id", "outer",
        )
        .na.fill(0)
    )
    counts.show()

    # 5. cross-detector agreement: SR hits confirmed by S-H-ESD
    agree = sr.select("series_id", "rn").join(
        esd.select("series_id", "rn"), ["series_id", "rn"]
    )
    print(f"SR ∩ S-H-ESD agreements: {agree.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
