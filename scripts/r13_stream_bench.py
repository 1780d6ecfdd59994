"""Round-13 streaming evidence (r12 verdict items #5 and #8): the
100x foreachBatch ingest loop with (a) a KILL between micro-batches +
checkpoint restart — recovery time and a no-re-admission assert — and
(b) one COMPACT cycle of the grown index, with admission-parity
asserted around it.

Protocol (extends r12_stream_bench): seed index = sf0.1 documents
(5k docs); 100x corpus (500k docs) re-sharded into N_SHARDS files;
maxFilesPerTrigger=1.  Phase 1 ingests until >= KILL_AFTER batches
have completed, then stops the query (graceful stop = between
batches, the documented maintenance window).  Phase 2 restarts from
the checkpoint and runs to completion (availableNow), recording
restart-to-first-batch and the remaining wall.  Asserts: admitted
doc_ids are globally unique (no re-admission), and every admitted doc
is fully indexed (repair_dedup_index returns 0).  Phase 3 runs
compact_dedup_index on the final ~500k-doc index with a fixed probe
batch evaluated before and after — verdict parity is the
exact-preservation claim, measured at the real grown index.

Writes STREAM_BENCH_r13.json.

Usage: python scripts/r13_stream_bench.py [n_shards]
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
KILL_AFTER = 8
WORK = "/tmp/r13_stream"


def start(spark, schema, src, index_path):
    from time_series_data_anomaly_detection_spark.streaming.dedup import (
        streaming_ingest_with_index,
    )

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    return streaming_ingest_with_index(
        stream,
        index_path=index_path,
        out_path=f"{WORK}/admitted",
        checkpoint=f"{WORK}/ckpt",
    )


def batch_durs(q):
    return [
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]


def main() -> None:
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.index import (
        build_dedup_index,
        compact_dedup_index,
        incremental_dedup_against_index,
        repair_dedup_index,
    )

    spark = get_spark(app_name="r13-stream-ingest")
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

    # ---- phase 1: ingest, then stop between micro-batches ----
    t1 = time.time()
    q = start(spark, docs.schema, src, index_path)
    while len(batch_durs(q)) < KILL_AFTER and q.isActive:
        time.sleep(2)
    q.stop()
    q.awaitTermination(600)
    phase1_sec = round(time.time() - t1, 1)
    phase1_batches = len(batch_durs(q))
    durs1 = batch_durs(q)

    # ---- phase 2: restart from the checkpoint, run to completion ----
    t2 = time.time()
    q2 = start(spark, docs.schema, src, index_path)
    while not batch_durs(q2) and q2.isActive:
        time.sleep(0.5)
    first_batch_after_restart = round(time.time() - t2, 1)
    q2.awaitTermination()
    phase2_sec = round(time.time() - t2, 1)
    durs2 = batch_durs(q2)

    admitted = spark.read.parquet(f"{WORK}/admitted")
    n_admitted = admitted.count()
    n_distinct = admitted.select("doc_id").distinct().count()
    assert n_admitted == n_distinct, (
        f"re-admission after restart: {n_admitted} rows, "
        f"{n_distinct} distinct doc_ids"
    )
    n_repaired = repair_dedup_index(
        admitted.select("doc_id", "text"), index_path
    )
    assert n_repaired == 0, f"{n_repaired} admitted docs were part-indexed"
    idx_docs = spark.read.parquet(f"{index_path}/sizes").count()

    # ---- phase 3: compact cycle with admission parity ----
    # mixed-verdict probe: exact dups of indexed docs, near-dups of
    # them, and genuinely fresh docs — so parity covers every branch
    from pyspark.sql import functions as F

    base_p = docs.select("doc_id", "text").orderBy("doc_id").limit(700)
    near_p = base_p.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing probe tail")).alias("text"),
    )
    fresh_p = base_p.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.md5(F.col("text")),
            F.md5(F.concat(F.col("text"), F.lit("x"))),
            F.md5(F.concat(F.col("text"), F.lit("y"))),
        ).alias("text"),
    )
    probe = (
        base_p.union(near_p).union(fresh_p).localCheckpoint(eager=True)
    )

    def verdicts():
        return {
            r.doc_id: r.verdict
            for r in incremental_dedup_against_index(
                spark, index_path, probe
            ).collect()
        }

    before = verdicts()
    stats = compact_dedup_index(spark, index_path)
    after = verdicts()
    assert before == after, "compact changed admission verdicts"

    durs = sorted(durs1 + durs2)
    n = len(durs)
    out = {
        "corpus": "100x (500k docs) in micro-batches vs growing index",
        "protocol": (
            f"graceful stop after {phase1_batches} batches "
            f"(between-batch kill), checkpoint restart, run to "
            f"completion; then one compact cycle with a 2000-doc "
            f"admission-parity probe"
        ),
        "n_batches": n,
        "rows_per_batch": 500_000 // N_SHARDS,
        "seed_index_docs": 5000,
        "seed_index_sec": seed_sec,
        "phase1_sec": phase1_sec,
        "phase1_batches": phase1_batches,
        "restart_to_first_batch_sec": first_batch_after_restart,
        "phase2_sec": phase2_sec,
        "total_ingest_sec": round(phase1_sec + phase2_sec, 1),
        "batch_p50_sec": round(durs[n // 2] / 1000, 2) if n else None,
        "batch_p95_sec": round(durs[int(n * 0.95)] / 1000, 2) if n else None,
        "admitted_docs": n_admitted,
        "readmitted_after_restart": n_admitted - n_distinct,
        "part_indexed_after_restart": n_repaired,
        "final_index_docs": idx_docs,
        "throughput_docs_per_sec": round(
            500_000 / (phase1_sec + phase2_sec), 0
        ),
        "compact": {
            "seconds": stats["seconds"],
            "admission_parity": "identical (2000-doc probe)",
            **{
                name: {
                    "files_before": stats[name]["before"]["files"],
                    "files_after": stats[name]["after"]["files"],
                    "mb_before": round(
                        stats[name]["before"]["bytes"] / 1e6, 1
                    ),
                    "mb_after": round(
                        stats[name]["after"]["bytes"] / 1e6, 1
                    ),
                }
                for name in ("digests", "bands", "shingles", "sizes")
            },
        },
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/STREAM_BENCH_r13.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
