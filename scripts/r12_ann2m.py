"""Round-12: ANN stress at 2M vectors (r11 verdict item #8 — one
decade past the 200k-vector r10/r11 stress, anchoring the
"billions of embeddings" story on the vector axis the way the
500k-series run anchored the series axis).

Fixture: the sf0.1 embeddings (2000 x 64-d) replicated 1000x with a
deterministic per-(vec, dim, replica) perturbation — every replica is
a DISTINCT vector (this is a similarity-search stress, not a dup
stress).  32 query vectors drawn from the corpus.

Measured: exact brute-force cosine top-k (the recall oracle), IVF
(cell-bounded candidates) and PQ (ADC over literal codebooks), plus
recall@k of each approximate path against the exact one on the SAME
fixture — cost without recall is not evidence.

Usage: python scripts/r12_ann2m.py [repl]   (default 1000 -> 2M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BIG = f"/tmp/ann{REPL}x"
K = 10
N_Q = 32


def build() -> None:
    import duckdb

    os.makedirs(BIG, exist_ok=True)
    if os.path.exists(f"{BIG}/embeddings.parquet"):
        return
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{BASE}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT v.vec_id + {n} * r.r AS vec_id,
                 CASE WHEN r.r = 0 THEN v.embedding
                      ELSE list_transform(v.embedding, (e, i) ->
                        CAST(e + (((v.vec_id * 31 + r.r * 7 + i) % 197)
                                  - 98.0) / 160.0 AS FLOAT))
                 END AS embedding,
                 v.label
          FROM '{BASE}/embeddings.parquet' v
          CROSS JOIN range({REPL}) r(r)
        ) TO '{BIG}/embeddings.parquet' (FORMAT parquet)
        """
    )
    print(f"fixture ready: {n * REPL} vectors", flush=True)


def main() -> None:
    build()
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.similarity import (
        cosine_topk,
        ivf_topk,
        pq_topk,
    )

    spark = get_spark(app_name=f"r12-ann-{REPL}x")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{BIG}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < N_Q)

    out: dict = {"n_vectors": emb.count(), "k": K, "n_queries": N_Q}

    t = time.time()
    exact = cosine_topk(emb, qs, k=K).select("query_id", "match_id")
    exact_rows = exact.collect()
    out["exact_sec"] = round(time.time() - t, 1)
    truth = {(r.query_id, r.match_id) for r in exact_rows}

    # IVF sized for constant cell occupancy (the semantic_dedup rule):
    # cells ~ N/2000 keeps ~2000 vectors/cell; nprobe 8 of 1000 cells
    # bounds scanned candidates to ~0.8% of the corpus per query
    n_cells = max(16, out["n_vectors"] // 2000)
    t = time.time()
    ivf = ivf_topk(
        emb, qs, k=K, n_cells=n_cells, nprobe=8, centroid_mode="seed"
    ).select("query_id", "match_id")
    ivf_rows = ivf.collect()
    out["ivf_sec"] = round(time.time() - t, 1)
    out["ivf_n_cells"] = n_cells
    out["ivf_recall"] = round(
        len(truth & {(r.query_id, r.match_id) for r in ivf_rows})
        / len(truth), 4,
    )

    # IVF's cost at 32 queries is index-build dominated (the corpus
    # assignment); its win is per-query amortization.  Measure the
    # SAME call at 32x the queries: if the wall barely moves, query
    # cost is marginal and the crossover vs exact (linear in queries)
    # is a few hundred queries.
    qs_many = emb.filter(F.col("vec_id") < N_Q * 32)
    t = time.time()
    ivf_topk(
        emb, qs_many, k=K, n_cells=n_cells, nprobe=8,
        centroid_mode="seed",
    ).write.format("noop").mode("overwrite").save()
    out["ivf_1024q_sec"] = round(time.time() - t, 1)

    # PQ at production code size: 16 bits/vector (m=4, n_codes=16, the
    # gate-scale toy) cannot rank 2M vectors (65k distinct codes, ~30
    # vectors per code -> tie soup); m=8 x 256 codes = 64 bits is the
    # standard setting, and the rerank stage buys exact ordering back
    # from a 10x shortlist.
    for m, n_codes, tag in ((4, 16, "pq16bit"), (8, 256, "pq64bit")):
        t = time.time()
        pq = pq_topk(emb, qs, k=K, m=m, n_codes=n_codes).select(
            "query_id", "match_id"
        )
        pq_rows = pq.collect()
        out[f"{tag}_sec"] = round(time.time() - t, 1)
        out[f"{tag}_recall"] = round(
            len(truth & {(r.query_id, r.match_id) for r in pq_rows})
            / len(truth), 4,
        )

    from time_series_data_anomaly_detection_spark.datapipe.similarity import (
        pq_rerank_topk,
    )

    t = time.time()
    rr = pq_rerank_topk(
        emb, qs, k=K, shortlist=100, m=8, n_codes=256
    ).select("query_id", "match_id")
    rr_rows = rr.collect()
    out["pq_rerank_sec"] = round(time.time() - t, 1)
    out["pq_rerank_recall"] = round(
        len(truth & {(r.query_id, r.match_id) for r in rr_rows})
        / len(truth), 4,
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
