"""End-to-end training-data walkthrough on the test corpus: quality
funnel → dedup clusters → stratified mix → packed context windows —
the datapipe story in one script.

Usage: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_anomaly_detection_spark import get_spark  # noqa: E402
from time_series_data_anomaly_detection_spark.datapipe import (  # noqa: E402
    corpus_prep,
    pack_stats,
    source_mix,
    stratified_sample,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. the prep funnel: quality/length/lang gates + exact and
    #    transitive near-dup stages, one verdict per doc
    prep = corpus_prep(docs, jaccard_threshold=0.5)
    prep.groupBy("verdict").count().orderBy("verdict").show()

    kept = docs.join(
        prep.filter(F.col("verdict") == "keep").select("doc_id"), "doc_id"
    )

    # 2. a training mix: 10k-token budget, weighted toward src0/src1
    mix = source_mix(kept, 10_000, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    mix.orderBy("source").show()
    fracs = {
        r["source"]: r["sample_fraction"]
        for r in mix.collect()
        if r["sample_fraction"] > 0
    }

    # 3. materialize the mix deterministically (re-runnable, salted)
    sampled = stratified_sample(kept, fracs, default_fraction=0.0)
    print("sampled docs:", sampled.count())

    # 4. pack into 512-token context windows, per-source shards
    packed = pack_stats(sampled, ctx=512)
    packed.orderBy("source", "chunk_id").show(10)
    full = packed.filter(F.col("fill_ratio") >= 1.0).count()
    print("chunks:", packed.count(), "fully packed:", full)


if __name__ == "__main__":
    main()
