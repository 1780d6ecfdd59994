"""gp_forecast first-pass variance probe (r10 verdict item #6).

BENCH_r10 recorded q_gp_forecast first-pass walls of 4.6–12.5 s across
runs while the warm retry sat stable at ~3.3 s.  This probe reproduces
the bench protocol — a FRESH process per run (fresh JVM, fresh python
workers, fresh JIT) — N times, timing first-pass + warm retry, and
decomposes the first-pass into fit-only (optimize=False, no LML grid)
vs the full fit+selection query.

Usage: python scripts/gp_variance.py [n_runs]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = """
import sys, time, json
sys.path.insert(0, "/root/repo")
from time_series_data_anomaly_detection_spark import get_spark
from time_series_data_anomaly_detection_spark.plans.registry import (
    q_gp_forecast, _series,
)
from time_series_data_anomaly_detection_spark.functions import gp_forecast

spark = get_spark(app_name="gp-var")
spark.sparkContext.setLogLevel("ERROR")
res = {}
t = time.time()
q_gp_forecast(spark, "/root/testdata/sf0.1").write.format("noop").mode(
    "overwrite").save()
res["first"] = round(time.time() - t, 2)
t = time.time()
q_gp_forecast(spark, "/root/testdata/sf0.1").write.format("noop").mode(
    "overwrite").save()
res["warm"] = round(time.time() - t, 2)
t = time.time()
gp_forecast(_series(spark, "/root/testdata/sf0.1"), train_frac=0.5,
            optimize=False).write.format("noop").mode("overwrite").save()
res["fit_only_warmworkers"] = round(time.time() - t, 2)
print("RESULT:" + json.dumps(res))
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, "-c", CHILD],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        lines = [
            ln for ln in out.stdout.splitlines() if ln.startswith("RESULT:")
        ]
        if lines:
            row = json.loads(lines[0][7:])
            rows.append(row)
            print(f"run{i}: {row}", flush=True)
        else:
            print(f"run{i}: FAILED\n{out.stderr[-800:]}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
