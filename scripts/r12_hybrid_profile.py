"""Round-12: attribute hybrid_detection's ~7% super-linear term at the
50k-series step (r11 verdict item #2 — 10.73x wall for a 10x series
step; ideal on a fixed 32-core box is 10.0x once the cores are full).

Method: run hybrid_detection at 5k and 50k series in ONE session with
the UI enabled, snapshot per-stage executor metrics (REST) around each
run, aggregate by what the stage does (python grouped-map vs native
shuffle vs scan), and compare growth stage-class by stage-class.  A
single super-linear class pins the attribution; uniform growth means
the overhead is distributed scheduling cost.

Also measures the pure-python fit floor: the per-series pandas fit
cost sampled driver-side x N / 32 cores = the wall the model math
alone would need with zero Spark overhead.

Usage: SPARK_GRAFT_UI=true python scripts/r12_hybrid_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_UI", "true")

NS = [5000, 50000]


def stages(spark) -> dict[int, dict]:
    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return {
        s["stageId"]: {
            "run_ms": s.get("executorRunTime", 0),
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "shuffle_write": s.get("shuffleWriteBytes", 0),
            "input": s.get("inputBytes", 0),
            "tasks": s.get("numCompleteTasks", 0),
            "name": s.get("name", ""),
        }
        for s in data
    }


def classify(name: str) -> str:
    n = name.lower()
    if "applyinpandas" in n or "flatmapgroupsinpandas" in n or "arrow" in n:
        return "python_grouped_map"
    if "exchange" in n or "shuffle" in n:
        return "shuffle"
    return "native"


def main() -> None:
    import __spark_entry__ as entrymod

    sys.path.insert(0, "/root/repo/scripts")
    from series_stress import fixture

    qs = entrymod.queries()["hybrid_detection"]
    from time_series_data_anomaly_detection_spark import get_spark

    spark = get_spark(app_name="r12-hybrid-profile")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    for n in NS:
        d = fixture(n)
        before = stages(spark)
        t = time.time()
        qs(spark, d).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t, 2)
        after = stages(spark)
        delta: dict[str, dict] = {}
        for sid, m in after.items():
            if sid in before:
                continue
            cls = classify(m["name"])
            agg = delta.setdefault(
                cls,
                {"run_ms": 0, "cpu_ms": 0, "shuffle_write": 0,
                 "tasks": 0, "stages": 0},
            )
            agg["run_ms"] += m["run_ms"]
            agg["cpu_ms"] += m["cpu_ms"]
            agg["shuffle_write"] += m["shuffle_write"]
            agg["tasks"] += m["tasks"]
            agg["stages"] += 1
        out[str(n)] = {"wall_sec": wall, "by_class": delta}
        print(f"n={n}: wall {wall}s", flush=True)
        for cls, agg in sorted(delta.items()):
            print(f"  {cls:20s} run {agg['run_ms']/1000:9.1f}s "
                  f"cpu {agg['cpu_ms']/1000:9.1f}s "
                  f"tasks {agg['tasks']:6d} stages {agg['stages']:3d} "
                  f"shufW {agg['shuffle_write']/1e6:9.1f}MB", flush=True)
    g = {}
    for cls in out[str(NS[1])]["by_class"]:
        a = out[str(NS[0])]["by_class"].get(cls, {}).get("run_ms", 0)
        b = out[str(NS[1])]["by_class"][cls]["run_ms"]
        g[cls] = round(b / a, 2) if a else None
    out["run_ms_growth_by_class"] = g
    out["wall_growth"] = round(
        out[str(NS[1])]["wall_sec"] / out[str(NS[0])]["wall_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
