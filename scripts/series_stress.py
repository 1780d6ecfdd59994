"""Wide-series stress: the engine's claimed 100 TB parallelism axis is
SERIES COUNT ("a 1M-series table spreads with no hand-scheduling",
SCALING.md), but every gate/bench table derives series from
events.event_type and therefore contains exactly FIVE series at every
SF — SF scales length, not width.  This script measures the claim:
synthesize N-series tables at FIXED per-series length and time the
grouped-map model families plus a windowed-native chain across a 100x
series-count spread.  Linear wall growth with N (or better, while the
32 cores are still filling up) = the claim holds; super-linear = a
plan that dies at 1M series.

Fixture: N series x L=512 points, NAB-shaped (daily seasonal at
period 48 + mild trend + deterministic hash noise + sparse spikes so
top-value labeling has something to find), written as an events.parquet
the registry's _series adapter reads unchanged.

Usage:
    python scripts/series_stress.py                   # default ladder
    SERIES_NS=5,500,5000 python scripts/series_stress.py bocpd_changepoints
Writes fixtures to /tmp/seriesw_{N} (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

L = int(os.environ.get("SERIES_LEN", "512"))
NS = [int(x) for x in os.environ.get("SERIES_NS", "5,500,5000,50000").split(",")]

# the grouped-map model families the r10 verdict called out, plus one
# windowed-native chain (detector_consensus) and the event-metrics
# overlap join (skew watch)
QUERIES = [
    "rolling_stats",          # pure native window chain (baseline)
    "detector_consensus",     # native chain + 2 grouped-map branches
    "event_metrics",          # RLE -> interval-overlap join
    "bocpd_changepoints",     # sequential grouped-map, O(T * runlen)
    "walk_forward_cv",        # per-(series, fold) fits
    "benchmark_leaderboard",  # 5 models x N series
    "hybrid_detection",       # the headline model ensemble
    "matrix_profile_tiled",   # tile-pair AB-join kernels
]


def fixture(n_series: int) -> str:
    import duckdb

    path = f"/tmp/seriesw_{n_series}"
    os.makedirs(path, exist_ok=True)
    f = f"{path}/events.parquet"
    if os.path.exists(f):
        return path
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT s * {L} + t AS event_id,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + INTERVAL (t * 30) MINUTE AS ts,
                 s % 997 AS user_id,
                 'w' || lpad(CAST(s AS VARCHAR), 6, '0') AS event_type,
                 10.0 * sin(2 * pi() * t / 48.0)
                   + 0.01 * t
                   + ((hash(s * 1000003 + t) % 1000) / 1000.0 - 0.5) * 2.0
                   + CASE WHEN hash(s * 7 + t * 13) % 211 = 0
                          THEN 25.0 ELSE 0.0 END AS value,
                 '{{}}' AS props
          FROM range({n_series}) g1(s), range({L}) g2(t)
        ) TO '{f}' (FORMAT parquet)
        """
    )
    return path


def main() -> None:
    import __spark_entry__ as entrymod
    from time_series_data_anomaly_detection_spark import get_spark

    spark = get_spark(app_name="series-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sys.argv[1:] or [n for n in QUERIES if n in qs]

    dirs = {n: fixture(n) for n in NS}
    print(f"fixtures ready: {NS} series x {L} points", flush=True)

    # warm the JVM/JIT on the smallest fixture
    qs[names[0]](spark, dirs[NS[0]]).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    warm = os.environ.get("SERIES_WARM") == "1"
    for name in names:
        row: dict[str, float] = {}
        for n in NS:
            t = time.time()
            qs[name](spark, dirs[n]).write.format("noop").mode(
                "overwrite"
            ).save()
            row[str(n)] = round(time.time() - t, 2)
            if warm:
                t = time.time()
                qs[name](spark, dirs[n]).write.format("noop").mode(
                    "overwrite"
                ).save()
                row[f"{n}_warm"] = round(time.time() - t, 2)
        # growth over the widest 10x step (the scale verdict number)
        hi, lo = str(NS[-1]), str(NS[-2] if len(NS) > 1 else NS[-1])
        row["last_step_growth"] = round(row[hi] / max(row[lo], 1e-9), 2)
        out[name] = row
        print(
            f"{name:24s} "
            + "  ".join(f"{n}s {row[str(n)]:8.2f}s" for n in NS)
            + f"   last-step {row['last_step_growth']:5.2f}x",
            flush=True,
        )
    # ONE protocol for every cell (the r11 artifact mixed a first-pass
    # sweep with a separate warm-only 500k run and drew ADVICE for it):
    # every number is labeled, and the JSON says how it was measured.
    print(json.dumps({
        "len": L,
        "ns": NS,
        "protocol": (
            "shared session, queries serial, box otherwise idle; "
            "unsuffixed cells = first execution of the plan in this "
            "session (cold python workers at the first cell only); "
            "'_warm' cells = immediate re-run of the same plan"
            + ("" if warm else "; SERIES_WARM=1 not set -> no warm cells")
        ),
        "queries": out,
    }))


if __name__ == "__main__":
    main()
