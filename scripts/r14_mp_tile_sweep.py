"""matrix_profile_tiled at 100x: tile-size sweep on a 2M-row series
(r13 VERDICT item #6 — the tiled SCAMP path is the production story
for the O(w^2) family but had no large-scale measurement).

Builds a single 2M-point series (the tiled path's parallelism axis is
tile PAIRS, so one long series is the worst case for skew and the best
probe of the knob), then times the full query at each tile size.  The
exact O(k^2) pair fan at 2M rows is ~5e13 flops through the BLAS QT
kernels — feasible, which is itself the scale evidence.

Usage: python scripts/r14_mp_tile_sweep.py [n_rows] [tile ...]
Defaults: 2_000_000 rows, tiles 4096 8192 16384.
Prints one JSON line; paste into SCALING.md / OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
TILES = [int(t) for t in sys.argv[2:]] or [4096, 8192, 16384]


def fixture(n_rows: int) -> str:
    import duckdb

    path = f"/tmp/mp2m_{n_rows}"
    os.makedirs(path, exist_ok=True)
    f = f"{path}/events.parquet"
    if not os.path.exists(f):
        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
              SELECT t AS event_id,
                     TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL (t) SECOND AS ts,
                     t % 997 AS user_id,
                     'mp' AS event_type,
                     10.0 * sin(2 * pi() * t / 48.0)
                       + ((hash(t) % 1000) / 1000.0 - 0.5) * 2.0
                       + CASE WHEN hash(t * 13) % 100003 = 0
                              THEN 40.0 ELSE 0.0 END AS value,
                     '{{}}' AS props
              FROM range({n_rows}) g(t)
            ) TO '{f}' (FORMAT parquet)
            """
        )
    return path


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401  (sys.path setup)
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.functions.matrix_profile import (
        matrix_profile_tiled,
    )
    from time_series_data_anomaly_detection_spark.plans.registry import _series
    from time_series_data_anomaly_detection_spark.session import release_caches

    spark = get_spark(app_name="r14-mp-tile")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = fixture(N)
    print(f"# fixture {sf_dir}: {N} rows, 1 series", file=sys.stderr)

    out = {"n_rows": N, "m": 24, "tiles": {}}
    for tile in TILES:
        release_caches()
        spark.sparkContext.setJobDescription(f"mp_tiled tile={tile}")
        t0 = time.perf_counter()
        df = matrix_profile_tiled(_series(spark, sf_dir), m=24, tile=tile)
        # same noop-sink methodology as the bench; discord columns force
        # the full min-merge
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 2)
        k = N - 24 + 1
        n_tiles = -(-k // tile)
        out["tiles"][str(tile)] = {
            "sec": dt,
            "n_tiles": n_tiles,
            "pair_tasks": n_tiles * (n_tiles + 1) // 2,
        }
        print(f"# tile={tile}: {dt}s ({n_tiles} tiles, "
              f"{n_tiles * (n_tiles + 1) // 2} pair tasks)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
