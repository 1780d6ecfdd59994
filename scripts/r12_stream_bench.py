"""Round-12: the foreachBatch ingest loop at the 100x corpus (r11
verdict item #7 — streaming_ingest_with_index has unit parity but its
only scale measurement was STREAM_BENCH_r10's detector floors).

Protocol: seed the persisted dedup index with the sf0.1 documents
(5k docs), re-shard the 100x corpus (500k docs) into N_SHARDS parquet
files, and stream them through streaming_ingest_with_index with
maxFilesPerTrigger=1 — one micro-batch per shard, each deduped against
the GROWING index, admitted docs appended + indexed.  Records
per-batch trigger durations (p50/p95), the index growth curve, and the
admit/reject split.  Writes STREAM_BENCH_r12.json.

Usage: python scripts/r12_stream_bench.py [n_shards]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/scale100x"
N_SHARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
WORK = "/tmp/r12_stream"


def main() -> None:
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.index import (
        build_dedup_index,
    )
    from time_series_data_anomaly_detection_spark.streaming.dedup import (
        streaming_ingest_with_index,
    )

    spark = get_spark(app_name="r12-stream-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    src = f"{WORK}/shards"
    docs = spark.read.parquet(f"{BIG}/documents.parquet")
    docs.repartition(N_SHARDS).write.parquet(src)

    index_path = f"{WORK}/index"
    seed = spark.read.parquet(f"{BASE}/documents.parquet")
    t = time.time()
    build_dedup_index(seed, index_path)
    seed_sec = round(time.time() - t, 1)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    t = time.time()
    q = streaming_ingest_with_index(
        stream,
        index_path=index_path,
        out_path=f"{WORK}/admitted",
        checkpoint=f"{WORK}/ckpt",
    )
    q.awaitTermination()
    total = round(time.time() - t, 1)

    durs = sorted(
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    )
    n = len(durs)
    admitted = spark.read.parquet(f"{WORK}/admitted").count()
    idx_docs = spark.read.parquet(f"{index_path}/sizes").count()
    out = {
        "corpus": "100x (500k docs) in micro-batches vs growing index",
        "n_batches": n,
        "rows_per_batch": 500_000 // N_SHARDS,
        "seed_index_docs": 5000,
        "seed_index_sec": seed_sec,
        "total_sec": total,
        "batch_p50_sec": round(durs[n // 2] / 1000, 2) if n else None,
        "batch_p95_sec": round(durs[int(n * 0.95)] / 1000, 2) if n else None,
        "batch_min_sec": round(durs[0] / 1000, 2) if n else None,
        "batch_max_sec": round(durs[-1] / 1000, 2) if n else None,
        "admitted_docs": admitted,
        "final_index_docs": idx_docs,
        "throughput_docs_per_sec": round(500_000 / total, 0),
    }
    print(json.dumps(out))
    with open("/root/repo/STREAM_BENCH_r12.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
