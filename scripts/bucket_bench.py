"""Measure what the bucketed layout actually buys: the same
join+aggregate workload against (a) plain parquet and (b) tables
bucketed on the join key, at sf0.1.

Workload: events-as-series fact joined to a per-series aggregate
frame on series_id, then a windowed count — the shape every per-series
pipeline stage starts with.  The bucketed variant's plan has ZERO
Exchange nodes (pinned by tests/test_plan_shapes.py); this script
measures the wall-clock consequence and prints one JSON line.

Usage: python scripts/bucket_bench.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.sources import (
        events_as_series,
        read_bucketed,
        write_bucketed,
    )

    spark = get_spark(app_name="bucket-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = events_as_series(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="bkbench_")

    # plain layout
    fact.write.mode("overwrite").parquet(f"{tmp}/plain_fact")
    fact.groupBy("series_id").agg(F.count("*").alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/plain_dim")

    # bucketed layout (same data)
    write_bucketed(
        fact, "bk_fact", f"{tmp}/bk_fact", keys=("series_id",), n_buckets=8,
        sort_by=("series_id", "rn") if "rn" in fact.columns else None,
    )
    write_bucketed(
        fact.groupBy("series_id").agg(F.count("*").alias("n")),
        "bk_dim", f"{tmp}/bk_dim", keys=("series_id",), n_buckets=8,
    )

    def workload(f, d):
        j = f.join(d, "series_id")
        return (
            j.groupBy("series_id")
            .agg(F.sum("value").alias("sv"), F.max("n").alias("n"))
        )

    def run(make):
        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    plain_t, bk_t = [], []
    for _ in range(n_runs):
        plain_t.append(
            run(
                lambda: workload(
                    spark.read.parquet(f"{tmp}/plain_fact"),
                    spark.read.parquet(f"{tmp}/plain_dim"),
                )
            )
        )
        bk_t.append(
            run(
                lambda: workload(
                    read_bucketed(spark, "bk_fact"),
                    read_bucketed(spark, "bk_dim"),
                )
            )
        )
    for t in ("bk_fact", "bk_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    out = {
        "plain_sec": [round(t, 3) for t in plain_t],
        "bucketed_sec": [round(t, 3) for t in bk_t],
        "speedup_min": round(min(plain_t) / min(bk_t), 2),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
