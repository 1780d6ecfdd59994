"""10x scale stress: synthesize a corpus 10x the largest testdata SF
(~50k docs / ~50k vectors) and measure the datapipe query families on
it vs sf0.1 — the growth factor is direct evidence for whether each
plan is data-bound-linear (target), overhead-bound (fine), or
super-linear (will not survive 100 TB).

The synthetic 10x corpus is dup-HEAVY by construction (each replica
appends a replica tag plus a slice of another doc), so the near-dup
pair generators and the skew guard are stressed harder than a clean
10x would — deliberately: that is what a real crawl looks like.

Usage: python scripts/scale_stress.py [queries ...]
Writes the 10x tables to /tmp/scale10x (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/scale10x"
REPL = 10

QUERIES = [
    "doc_stats",
    "bigram_surprise",
    "pii_scan",
    "repetition_stats",
    "training_order",
    "stratified_sample",
    "exact_dedup",
    "decontaminate",
    "minhash_lsh",
    "dedup_clusters",
    "curation_pipeline",
    "pack_chunks",
    "semantic_dedup",
    "ivf_topk",
    "pq_topk",
    "cosine_topk",
]


def build() -> None:
    import duckdb

    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{BASE}/documents.parquet'"
    ).fetchone()[0]
    if not os.path.exists(f"{BIG}/documents.parquet"):
        con.execute(
            f"""
            COPY (
              SELECT d.doc_id + {n_docs} * r.r AS doc_id,
                     CASE WHEN r.r = 0 THEN d.text
                          ELSE d.text || ' rep' || r.r || ' '
                               || substr(o.text, 1, 200) END AS text,
                     d.lang, d.source,
                     length(CASE WHEN r.r = 0 THEN d.text
                                 ELSE d.text || ' rep' || r.r || ' '
                                      || substr(o.text, 1, 200) END)
                       AS n_chars
              FROM '{BASE}/documents.parquet' d
              CROSS JOIN range({REPL}) r(r)
              JOIN '{BASE}/documents.parquet' o
                ON o.doc_id = (d.doc_id + r.r * 37) % {n_docs}
            ) TO '{BIG}/documents.parquet' (FORMAT parquet)
            """
        )
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{BASE}/embeddings.parquet'"
    ).fetchone()[0]
    if not os.path.exists(f"{BIG}/embeddings.parquet"):
        con.execute(
            f"""
            COPY (
              SELECT v.vec_id + {n_vecs} * r.r AS vec_id,
                     v.embedding, v.label
              FROM '{BASE}/embeddings.parquet' v
              CROSS JOIN range({REPL}) r(r)
            ) TO '{BIG}/embeddings.parquet' (FORMAT parquet)
            """
        )
    print(f"10x corpus ready: {n_docs * REPL} docs, {n_vecs * REPL} vectors")


def main() -> None:
    build()
    import __spark_entry__ as entrymod
    from time_series_data_anomaly_detection_spark import get_spark

    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sys.argv[1:] or [n for n in QUERIES if n in qs]

    # warm the JVM/JIT once
    qs[names[0]](spark, BASE).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        row = {}
        for label, d in (("sf0.1", BASE), ("10x", BIG)):
            t = time.time()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            row[label] = round(time.time() - t, 2)
        row["growth"] = round(row["10x"] / max(row["sf0.1"], 1e-9), 2)
        out[name] = row
        print(f"{name:25s} sf0.1 {row['sf0.1']:7.2f}s   10x {row['10x']:7.2f}s"
              f"   growth {row['growth']:5.2f}x", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
