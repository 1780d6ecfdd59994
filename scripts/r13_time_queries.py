"""Time a named subset of queries in one session: first-pass + N warm
cells each, noop sink, job-labeled.  For r13 before/after iteration
without a full bench run.

Usage: python scripts/r13_time_queries.py [--sf DIR] [--reps N] q1 q2 ...
Prints one JSON line {query: {"first": s, "warm": s, "cells": [...]}}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.session import release_caches

    spark = get_spark(app_name="r13-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        cells = []
        for r in range(reps):
            release_caches()
            spark.sparkContext.setJobDescription(f"{name}#cell{r}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            cells.append(round(time.perf_counter() - t0, 3))
            print(f"# {name} cell{r}: {cells[-1]:.3f}s", file=sys.stderr)
        out[name] = {
            "first": cells[0],
            "warm": min(cells[1:]) if len(cells) > 1 else cells[0],
            "cells": cells,
        }
    release_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
