"""End-to-end corpus-hygiene walkthrough on the test corpus:
curation verdict ladder → drift check → deterministic training order →
sharded layout on disk — the round-5 operator family in one script.

Usage: python examples/hygiene_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_anomaly_detection_spark import get_spark  # noqa: E402
from time_series_data_anomaly_detection_spark.datapipe import (  # noqa: E402
    corpus_drift,
    semantic_dedup,
    write_training_shards,
)
from time_series_data_anomaly_detection_spark.datapipe.decontam import (  # noqa: E402
    curation_pipeline,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-hygiene")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. the hygiene ladder: decontamination vs the hash-carved eval
    #    split, PII, repetition, quality — first failure wins
    cur = curation_pipeline(docs, eval_frac=0.05, n=5)
    cur.groupBy("verdict").count().orderBy("verdict").show()
    kept = docs.join(
        cur.filter(F.col("verdict") == "keep").select("doc_id"), "doc_id"
    )

    # 2. semantic dedup over the embedding table (cells confine pairs)
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sd = semantic_dedup(embs, threshold=0.4, n_cells=16)
    print(
        "semantic dedup: kept",
        sd.filter("keep = 1").count(),
        "of",
        sd.count(),
    )

    # 3. drift report: kept corpus vs the raw lake (did curation skew
    #    the source mix?)
    drift = corpus_drift(docs, kept)
    drift.orderBy("source").show(5)
    tvd = drift.agg(F.sum("tv_term").alias("tvd")).collect()[0]["tvd"]
    print(f"source-mix TVD raw->curated: {tvd:.4f}")

    # 4. deterministic training order, materialized as sorted shards
    out = os.path.join(tempfile.mkdtemp(prefix="shards_"), "train")
    write_training_shards(kept, out, n_epochs=1, n_shards=4)
    back = spark.read.parquet(out)
    print("shard layout:", out)
    back.groupBy("shard").count().orderBy("shard").show()


if __name__ == "__main__":
    main()
