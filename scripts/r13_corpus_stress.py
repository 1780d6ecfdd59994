"""Round-13: pin the post-fix 100x dedup-funnel numbers in a diffable
JSON artifact (r12 verdict item #7 — the 80.4 s corpus_prep / 58.5 s
minhash_lsh figures lived only in SCALING.md prose).

Protocol (the SERIES_STRESS/STREAM_BENCH pattern): one session, box
otherwise idle, first-pass cell = first execution of the plan in the
session, '_warm' = immediate re-run.  Alongside wall seconds it
records the funnel COUNTS that the honest s-curve governs — LSH
candidate pairs surviving the size prefilter, and verified pairs at
the threshold — so a future hash-family or banding regression shows
up as a count diff, not just a timing drift.

Writes CORPUS_STRESS_r13.json; builds /tmp/scale100x first if absent
(scale_stress.build, SCALE_REPL=100 — reused when present).

Usage: python scripts/r13_corpus_stress.py
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
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.dedup import (
        minhash_lsh_pairs,
    )

    spark = get_spark(app_name="r13-corpus-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict = {
        "corpus": "/tmp/scale100x (500k docs, dup_frac=0.1 heavy cliques)",
        "protocol": (
            "one session, queries serial, box otherwise idle; "
            "unsuffixed = first execution of the plan in-session, "
            "'_warm' = immediate re-run"
        ),
    }

    for name in ("minhash_lsh", "corpus_prep", "dedup_clusters"):
        row = {}
        for suffix in ("", "_warm"):
            t = time.time()
            qs[name](spark, BIG).write.format("noop").mode(
                "overwrite"
            ).save()
            row["first" if not suffix else "warm"] = round(
                time.time() - t, 1
            )
        out[name] = row
        print(name, row, flush=True)

    # funnel counts at the gate-pinned 4x4 banding, threshold 0.5:
    # verified pairs from the public operator; candidate volume =
    # pairs that reach exact verification (re-derived with the same
    # exact-preserving prefilters by diffing the verify filter out)
    docs = spark.read.parquet(f"{BIG}/documents.parquet")
    verified = minhash_lsh_pairs(docs, n=3, threshold=0.5).count()
    out["verified_pairs"] = verified

    from pyspark.sql import functions as F
    from time_series_data_anomaly_detection_spark.datapipe.dedup import (
        _banded,
        minhash_signatures_from,
        shingles,
    )
    from time_series_data_anomaly_detection_spark.datapipe._skew import (
        DEFAULT_BUCKET_CAP,
        salted_self_join_pairs,
    )

    sh = shingles(docs, 3, "text", "doc_id")
    szs = sh.groupBy("doc_id").agg(F.count("*").alias("__n"))
    banded = _banded(minhash_signatures_from(sh, "doc_id")).join(
        szs.hint("shuffle_hash"), "doc_id"
    )
    raw = salted_self_join_pairs(
        banded, ["band", "band_key"], "doc_id", cap=DEFAULT_BUCKET_CAP
    ).filter(
        F.least(F.col("a.__n"), F.col("b.__n")).cast("double")
        >= F.lit(0.5) * F.greatest(F.col("a.__n"), F.col("b.__n"))
        - F.lit(1e-9)
    )
    candidates = (
        raw.select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
        .count()
    )
    out["candidate_pairs_after_prefilter"] = candidates
    out["candidate_precision"] = round(verified / max(candidates, 1), 4)

    print(json.dumps(out, indent=1))
    with open("/root/repo/CORPUS_STRESS_r13.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
