"""Round-11 measurements on the 100× corpus (r10 verdict items #4/#5):

1. semantic_dedup pair-payload A/B at 200k vectors: exact (float64
   vectors through the within-cell pair shuffle) vs int8 (1-byte codes
   + exact re-check of threshold-possible pairs).  Records wall,
   SHUFFLE WRITE BYTES (UI REST, per-run delta), and asserts the keep
   decisions agree (sum + count).
2. corpus_to_batches_bpe stage breakdown at 500k docs: A prep funnel →
   B 64-merge trainer → C Arrow encode → D pack windows, plus the
   encoder's per-partition word-memoization hit rate (the Zipf-head
   collapse the 100 TB story leans on).

Usage: python scripts/r11_measure.py [int8|bpe] (default: both)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_UI", "true")

BIG = "/tmp/scale100x"


def shuffle_write_bytes(spark) -> int:
    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in data)


def bench_int8(spark) -> dict:
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark.datapipe.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{BIG}/embeddings.parquet")
    out: dict = {}
    for mode in ("exact", "int8"):
        b0 = shuffle_write_bytes(spark)
        t = time.time()
        agg = (
            semantic_dedup(emb, threshold=0.95, pair_payload=mode)
            .agg(
                F.sum("keep").alias("kept"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        wall = round(time.time() - t, 1)
        db = shuffle_write_bytes(spark) - b0
        out[mode] = {
            "wall_s": wall,
            "shuffle_write_mb": round(db / 1e6, 1),
            "kept": agg["kept"],
            "n": agg["n"],
        }
        print(f"semantic_dedup[{mode}]: {out[mode]}", flush=True)
    assert out["exact"]["kept"] == out["int8"]["kept"], "keep sums differ!"
    assert out["exact"]["n"] == out["int8"]["n"]
    out["shuffle_cut"] = round(
        out["exact"]["shuffle_write_mb"]
        / max(out["int8"]["shuffle_write_mb"], 1e-9),
        2,
    )
    return out


def bench_bpe(spark) -> dict:
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark.datapipe import corpus_prep
    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        pack_stats_from_counts,
    )
    from time_series_data_anomaly_detection_spark.datapipe.tokenize_bpe import (
        WORD_RE,
        _encode_word,
        bpe_encode_stats,
        bpe_learn_merges,
    )
    from time_series_data_anomaly_detection_spark.plans.registry_datapipe import (
        JACCARD_T,
        PACK_CTX,
    )
    from time_series_data_anomaly_detection_spark.session import eager_cache

    docs = spark.read.parquet(f"{BIG}/documents.parquet")
    out: dict = {}

    t = time.time()
    kept = eager_cache(
        corpus_prep(docs, jaccard_threshold=JACCARD_T)
        .filter(F.col("verdict") == "keep")
        .select("doc_id")
    )
    n_kept = kept.count()
    out["A_funnel_s"] = round(time.time() - t, 1)
    out["n_kept"] = n_kept
    print(f"A funnel: {out['A_funnel_s']}s, kept {n_kept}", flush=True)

    kd = docs.join(F.broadcast(kept), "doc_id")
    t = time.time()
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn_merges(kd, spark, n_merges=64)
        .orderBy("merge_rank")
        .collect()
    ]
    out["B_trainer_s"] = round(time.time() - t, 1)
    print(f"B trainer: {out['B_trainer_s']}s ({len(merges)} merges)", flush=True)

    t = time.time()
    counts = eager_cache(
        bpe_encode_stats(kd, merges, keep_cols=("source",)).select(
            "doc_id", "source", "n_bpe_tokens"
        )
    )
    counts.count()
    out["C_encode_s"] = round(time.time() - t, 1)
    print(f"C encode: {out['C_encode_s']}s", flush=True)

    t = time.time()
    pack_stats_from_counts(counts, ctx=PACK_CTX, count_col="n_bpe_tokens").write.format(
        "noop"
    ).mode("overwrite").save()
    out["D_pack_s"] = round(time.time() - t, 1)
    print(f"D pack: {out['D_pack_s']}s", flush=True)
    counts.unpersist()

    # memoization hit rate: replicate the encoder's per-partition memo
    # (same WORD_RE, same _encode_word) but emit counters instead of
    # per-doc stats — the production UDF stays untouched
    import re

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re_src = WORD_RE

    def memo_probe(it):
        word_re = re.compile(word_re_src)
        memo: dict[str, int] = {}
        inst = 0
        for pdf in it:
            for text in pdf["text"].astype(str):
                for w in word_re.findall(text.lower()):
                    inst += 1
                    if w not in memo:
                        memo[w] = len(_encode_word(w, ranks))
        yield pd.DataFrame(
            {"instances": [inst], "unique_words": [len(memo)]}
        )

    t = time.time()
    probe = (
        kd.select("doc_id", "text")
        .mapInPandas(memo_probe, "instances long, unique_words long")
        .agg(
            F.sum("instances").alias("instances"),
            F.sum("unique_words").alias("encoded"),
        )
        .collect()[0]
    )
    out["memo_probe_s"] = round(time.time() - t, 1)
    out["word_instances"] = probe["instances"]
    out["words_encoded"] = probe["encoded"]
    out["memo_hit_rate"] = round(1 - probe["encoded"] / probe["instances"], 4)
    kept.unpersist()
    print(
        f"memo: {probe['instances']} instances, {probe['encoded']} encoded "
        f"-> hit rate {out['memo_hit_rate']}",
        flush=True,
    )
    return out


def main() -> None:
    from time_series_data_anomaly_detection_spark import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark(app_name="r11-measure")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {}
    if which in ("int8", "both"):
        res["int8_ab"] = bench_int8(spark)
    if which in ("bpe", "both"):
        res["bpe_breakdown"] = bench_bpe(spark)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
