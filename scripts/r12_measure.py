"""Round-12 measurements (r11 verdict item #1): the LSH-candidate
exact-verification long pole at the 100x corpus (500k docs).

Subcommands (one per fresh process — the r11 gp_variance study showed
host page-cache state moves first-pass walls, so each config gets its
own JVM):

  minhash [band_rows num_perm]  time minhash_lsh_pairs end-to-end on
                                /tmp/scale100x (count + wall); default
                                banding = the gate-pinned 4x4 contract
  recall  [band_rows num_perm]  lsh_recall_stats at sf0.1 (exact truth
                                side is affordable at 5k docs) for the
                                given banding config

Usage: python scripts/r12_measure.py minhash [6 60]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BIG = "/tmp/scale100x"
SF01 = "/root/testdata/sf0.1"


def main() -> None:
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.dedup import (
        BAND_ROWS,
        NUM_PERM,
        lsh_recall_stats,
        minhash_lsh_pairs,
    )

    cmd = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    band_rows = int(sys.argv[2]) if len(sys.argv) > 2 else BAND_ROWS
    num_perm = int(sys.argv[3]) if len(sys.argv) > 3 else NUM_PERM

    spark = get_spark(app_name=f"r12-{cmd}-{band_rows}x{num_perm}")
    spark.sparkContext.setLogLevel("ERROR")

    if cmd == "minhash":
        docs = spark.read.parquet(f"{BIG}/documents.parquet")
        t = time.time()
        n_pairs = minhash_lsh_pairs(
            docs, n=3, threshold=0.5,
            band_rows=band_rows, num_perm=num_perm,
        ).count()
        wall = round(time.time() - t, 1)
        print(json.dumps({
            "config": f"{num_perm} perms, bands of {band_rows}",
            "corpus": "100x (500k docs)",
            "wall_sec": wall,
            "n_pairs": n_pairs,
        }))
    elif cmd == "corpus_prep":
        from time_series_data_anomaly_detection_spark.datapipe.corpus import (
            corpus_prep,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{BIG}/documents.parquet")
        t = time.time()
        verdicts = {
            r["verdict"]: r["n"]
            for r in corpus_prep(docs)
            .groupBy("verdict")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        wall = round(time.time() - t, 1)
        print(json.dumps({
            "corpus": "100x (500k docs)",
            "wall_sec": wall,
            "verdicts": verdicts,
        }))
    elif cmd == "recall":
        docs = spark.read.parquet(f"{SF01}/documents.parquet")
        t = time.time()
        row = lsh_recall_stats(
            docs, n=3, threshold=0.5,
            band_rows=band_rows, num_perm=num_perm,
        ).collect()[0]
        wall = round(time.time() - t, 1)
        print(json.dumps({
            "config": f"{num_perm} perms, bands of {band_rows}",
            "corpus": "sf0.1 (5k docs)",
            "wall_sec": wall,
            **{k: row[k] for k in row.asDict()},
        }))
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
