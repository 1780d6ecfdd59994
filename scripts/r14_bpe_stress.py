"""Round-14: corpus_to_batches_bpe stage breakdown at 100x (r13
VERDICT item #4) — where the BPE family's time actually goes at 500k
docs: the distributed word-count collect, the driver-side merge loop
(per-merge-step cost — the VERDICT's 'if it exceeds ~1 s/merge-step'
question), the mapInPandas encode pass (with the per-task word-memo
hit rate measured on real batches), and the packing tail.

Reuses the r13 500k-doc corpus fixture (/tmp/scale100x, built on
demand).  One session, box otherwise idle; unsuffixed = first
execution in-session, '_warm' = immediate re-run.

Usage: python scripts/r14_bpe_stress.py
Writes BPE_STRESS_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

BIG = "/tmp/scale100x"


def main() -> None:
    os.environ["SCALE_REPL"] = "100"
    import scale_stress

    scale_stress.build()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe import tokenize_bpe as TB
    from time_series_data_anomaly_detection_spark.session import release_caches

    spark = get_spark(app_name="r14-bpe-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict = {
        "corpus": "/tmp/scale100x (500k docs, dup_frac=0.1 heavy cliques)",
        "protocol": (
            "one session, serial, box otherwise idle; unsuffixed = "
            "first in-session execution, '_warm' = immediate re-run"
        ),
    }

    docs = spark.read.parquet(f"{BIG}/documents.parquet")

    # --- stage 1: distributed word count + driver collect ------------
    spark.sparkContext.setJobDescription("bpe: word_freq collect")
    t0 = time.time()
    wf_rows = (
        TB.word_freq_table(docs, "text")
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(30000)
        .collect()
    )
    out["word_freq_collect_sec"] = round(time.time() - t0, 2)
    out["vocab_rows_collected"] = len(wf_rows)

    # --- stage 2: driver merge loop, per-step cost --------------------
    words = [(list(r["word"]), int(r["freq"])) for r in wf_rows]
    t0 = time.time()
    merges = TB._merge_loop(words, 50)
    dt = time.time() - t0
    out["merge_loop_sec"] = round(dt, 3)
    out["merge_steps"] = len(merges)
    out["sec_per_merge_step"] = round(dt / max(len(merges), 1), 4)

    # --- stage 3: encode pass + memo hit rate -------------------------
    # memo hit rate measured on the driver over a 2k-doc sample with the
    # same per-batch memo semantics the task-side encoder uses
    import re as _re

    ranks = {(m[1], m[2]): m[0] for m in merges}
    word_re = _re.compile(TB.WORD_RE)
    sample = [r["text"] for r in docs.select("text").limit(2000).collect()]
    memo: dict[str, int] = {}
    hits = total = 0
    for text in sample:
        for w in word_re.findall(text.lower()):
            total += 1
            if w in memo:
                hits += 1
            else:
                memo[w] = len(TB._encode_word(w, ranks))
    out["memo_hit_rate_2k_docs"] = round(hits / max(total, 1), 4)
    out["unique_words_2k_docs"] = len(memo)
    out["words_seen_2k_docs"] = total

    spark.sparkContext.setJobDescription("bpe: encode pass")
    enc = TB.bpe_encode_stats(docs, [(m[1], m[2]) for m in merges], "text")
    for suffix in ("", "_warm"):
        t0 = time.time()
        enc.write.format("noop").mode("overwrite").save()
        out[f"encode_pass_sec{suffix}"] = round(time.time() - t0, 2)

    # --- the full registered query at 100x ----------------------------
    for name in ("corpus_to_batches_bpe", "corpus_to_batches_bpe_fixed"):
        row = {}
        for suffix in ("", "_warm"):
            release_caches()
            spark.sparkContext.setJobDescription(f"{name}{suffix}")
            t0 = time.time()
            qs[name](spark, BIG).write.format("noop").mode(
                "overwrite"
            ).save()
            row[f"sec{suffix}"] = round(time.time() - t0, 2)
        out[name] = row

    release_caches()
    with open("/root/repo/BPE_STRESS_r14.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
