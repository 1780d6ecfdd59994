import pytest

from time_series_data_anomaly_detection_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tsad-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def series_df(spark, values, series_id="s1", start="2024-01-01", freq_min=30):
    """Build a tiny (series_id, timestamp, value, event_id, rn) frame."""
    import pandas as pd

    ts = pd.date_range(start, periods=len(values), freq=f"{freq_min}min")
    pdf = pd.DataFrame(
        {
            "series_id": series_id,
            "timestamp": ts,
            "value": [float(v) for v in values],
            "event_id": range(len(values)),
        }
    )
    from time_series_data_anomaly_detection_spark.sources import with_row_index

    return with_row_index(spark.createDataFrame(pdf))


def flags_df(spark, flags, series_id="s1"):
    return series_df(spark, flags, series_id).withColumnRenamed("value", "raw").selectExpr(
        "series_id", "timestamp", "event_id", "rn", "cast(raw as int) as flag"
    )
