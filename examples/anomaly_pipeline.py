"""End-to-end anomaly-detection walkthrough on the test data: load →
scale → detect → evaluate → sweep — the reference's
``run_hybrid.py``-style workflow expressed through the engine's API.

Usage: python examples/anomaly_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_anomaly_detection_spark import get_spark  # noqa: E402
from time_series_data_anomaly_detection_spark.operators.evaluate import (  # noqa: E402
    event_level_metrics,
    pointwise_metrics,
)
from time_series_data_anomaly_detection_spark.operators.events import (  # noqa: E402
    flags_to_events,
    persistence_filter,
)
from time_series_data_anomaly_detection_spark.operators.labeling import (  # noqa: E402
    mark_top_value_windows,
)
from time_series_data_anomaly_detection_spark.operators.rolling import (  # noqa: E402
    adaptive_threshold_flags,
)
from time_series_data_anomaly_detection_spark.operators.sweep import (  # noqa: E402
    threshold_sweep_pointwise,
)
from time_series_data_anomaly_detection_spark.sources import (  # noqa: E402
    events_as_series,
    with_row_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-anomaly")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load the multi-series table and attach positional indexes
    series = with_row_index(events_as_series(spark, sf_dir))

    # 2. weak labels for the demo: top-value windows per series
    labeled = mark_top_value_windows(series, n=5, window_size=3)

    # 3. detect: rolling adaptive threshold (W1) + persistence filter
    flags = persistence_filter(
        adaptive_threshold_flags(labeled, k=2.5), "flag", p=1
    )

    # 4. events + metrics
    events = flags_to_events(flags, "flag", gap=2)
    print("detected events:", events.count())
    pointwise_metrics(flags).show(truncate=False)
    event_level_metrics(flags, gap=2).show(truncate=False)

    # 5. choose k per series by F1 over a 17-point grid — ONE scan
    best = threshold_sweep_pointwise(
        flags.withColumn(
            "score",
            F.abs(F.col("value") - F.col("roll_mean"))
            / (F.col("roll_std") + F.lit(1e-6)),
        ),
        "score",
        "is_anomaly",
    )
    best.show(truncate=False)


if __name__ == "__main__":
    main()
