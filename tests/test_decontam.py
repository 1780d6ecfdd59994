"""Unit tests for corpus-hygiene operators (decontamination, repetition
signals, PII scan/redact, semantic dedup, training order) on tiny
corpora with known answers."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_series_data_anomaly_detection_spark.datapipe import (
    decontaminate,
    pii_scan,
    repetition_stats,
    semantic_dedup,
    training_order,
)
from time_series_data_anomaly_detection_spark.datapipe.decontam import (
    eval_member,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_pii_scan_counts_and_redaction(spark):
    txt = (
        "mail me at alice@example.com or bob.smith@corp.co.uk, "
        "server 10.0.0.1 and 192.168.1.254, ssn 123-45-6789 end"
    )
    out = pii_scan(_docs(spark, [(0, txt), (1, "no pii here")])).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["n_emails"] == 2
    assert by[0]["n_ips"] == 2
    assert by[0]["n_ids"] == 1
    assert by[0]["pii_total"] == 5
    expected = (
        "mail me at <EMAIL> or <EMAIL>, "
        "server <IP> and <IP>, ssn <ID> end"
    )
    assert by[0]["redacted_len"] == len(expected)
    assert by[0]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert by[1]["pii_total"] == 0
    assert by[1]["redacted_md5"] == hashlib.md5(b"no pii here").hexdigest()


def test_repetition_stats_exact_fractions(spark):
    # "a b a b a b": 2-grams = [ab, ba, ab, ba, ab] -> all 5 duplicated,
    # top gram "a b" occurs 3x; 3-grams = [aba, bab, aba, bab] -> all dup
    rep = "a b a b a b"
    uniq = "one two three four five"
    lines = "x\ny\nx\n\nz"  # duplicate line 'x' (2 of 4 non-empty lines)
    out = repetition_stats(
        _docs(spark, [(0, rep), (1, uniq), (2, lines)])
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["n_2grams"] == 5
    assert by[0]["dup_2gram_frac"] == pytest.approx(1.0, abs=1e-6)
    assert by[0]["top_2gram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert by[0]["dup_3gram_frac"] == pytest.approx(1.0, abs=1e-6)
    assert by[1]["dup_2gram_frac"] == 0.0
    assert by[1]["top_2gram_frac"] == pytest.approx(1 / 4, abs=1e-6)
    assert by[2]["n_lines"] == 4
    assert by[2]["dup_line_frac"] == pytest.approx(2 / 4, abs=1e-6)


def test_decontaminate_flags_eval_overlap(spark):
    # discover which small ids the hash carves into the eval split
    ids = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    ev = ids.filter(eval_member(F.col("doc_id"), 0.2)).collect()
    assert ev, "expected at least one eval id in 0..49 at frac 0.2"
    eval_id = ev[0]["doc_id"]
    non_eval = [
        r["doc_id"]
        for r in ids.filter(~eval_member(F.col("doc_id"), 0.2)).collect()
    ]
    leak_id, clean_id = non_eval[0], non_eval[1]
    shared = "alpha beta gamma delta epsilon"  # one 5-gram
    rows = [
        (eval_id, f"prefix words {shared} suffix words"),
        (leak_id, f"unrelated opening {shared} closing remark"),
        (clean_id, "totally disjoint content with no overlap at all here"),
    ]
    out = decontaminate(_docs(spark, rows), eval_frac=0.2, n=5).collect()
    by = {r["doc_id"]: r for r in out}
    assert eval_id not in by  # eval docs are not scored
    assert by[leak_id]["contaminated"] == 1
    assert by[leak_id]["n_hit"] >= 1
    assert by[clean_id]["contaminated"] == 0
    assert by[clean_id]["n_hit"] == 0


def test_semantic_dedup_drops_near_duplicate_in_cell(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.01]),  # same cell as 0, cosine ~1 -> dropped
        (3, [0.7, 0.7]),  # ties to cell 0, cosine ~0.71 to mates -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.95, n_cells=2).collect()
    by = {r["vec_id"]: r for r in out}
    assert by[2]["keep"] == 0 and by[2]["max_lower_cos"] > 0.99
    assert by[0]["keep"] == 1 and by[0]["max_lower_cos"] == -1.0
    assert by[1]["keep"] == 1
    assert by[3]["keep"] == 1 and by[3]["cell"] == 0


def test_training_order_is_deterministic_partition_of_docs(spark):
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    out = training_order(docs, n_epochs=2, n_shards=4).toPandas()
    # every doc appears exactly once per epoch
    assert len(out) == 400
    assert out.groupby("epoch")["doc_id"].nunique().tolist() == [200, 200]
    # positions are contiguous 1..k within each (epoch, shard)
    for (_, _), g in out.groupby(["epoch", "shard"]):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    # epochs shuffle differently
    e0 = out[out.epoch == 0].sort_values(["shard", "pos"])["doc_id"].tolist()
    e1 = out[out.epoch == 1].sort_values(["shard", "pos"])["doc_id"].tolist()
    assert e0 != e1
    # repartition-stable: same assignment regardless of input layout
    out2 = training_order(
        docs.repartition(7), n_epochs=2, n_shards=4
    ).toPandas()
    a = out.sort_values(["epoch", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["epoch", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_curation_pipeline_verdict_ladder(spark):
    from time_series_data_anomaly_detection_spark.datapipe.decontam import (
        curation_pipeline,
    )

    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    ev = [r["doc_id"] for r in ids.filter(eval_member(F.col("doc_id"), 0.2)).collect()]
    ne = [r["doc_id"] for r in ids.filter(~eval_member(F.col("doc_id"), 0.2)).collect()]
    eval_id = ev[0]
    contam, piiheavy, repet, short, lowq, keep = ne[:6]
    shared = "omega theta sigma lambda kappa"
    keep_txt = (
        "the quick brown fox jumps over a lazy dog and the river is "
        "wide and the sun is warm and it shines over the green field "
        "where a small bird sings of the morning and the wind moves "
        "softly through the tall grass near the old stone bridge today"
    )
    rows = [
        (eval_id, f"benchmark question {shared} answer text"),
        (contam, f"training doc leaking {shared} verbatim here"),
        (
            piiheavy,
            "contact a@x.com b@y.org c@z.net d@w.io for the offer details",
        ),
        (repet, "spam " * 40),
        (short, "just a few short words"),
        (lowq, " ".join(f"tok{i}" for i in range(25))),
        (keep, keep_txt),
    ]
    out = curation_pipeline(
        _docs(spark, rows), eval_frac=0.2, n=5
    ).collect()
    by = {r["doc_id"]: r["verdict"] for r in out}
    assert by[eval_id] == "eval_holdout"
    assert by[contam] == "contaminated"
    assert by[piiheavy] == "pii_heavy"
    assert by[repet] == "repetitive"
    assert by[short] == "too_short"
    assert by[lowq] == "low_quality"
    assert by[keep] == "keep"
    # the kept doc's digest matches its (unchanged) text
    md5s = {r["doc_id"]: r["redacted_md5"] for r in out}
    assert md5s[keep] == hashlib.md5(keep_txt.encode()).hexdigest()


def test_semantic_dedup_kmeans_mode(spark):
    """centroid_mode='kmeans': clustered near-identical vectors land in
    the same trained cell and the lowest id of each clump survives."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 1, (3, 8))
    rows = []
    for i in range(60):
        c = centers[i % 3]
        # every third vector is a near-copy of vector i-3 (same clump)
        rows.append((i, (c + rng.normal(0, 0.01, 8)).tolist()))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    )
    out = semantic_dedup(
        df, threshold=0.999, n_cells=3, centroid_mode="kmeans"
    ).toPandas()
    # per generative clump (vec_id % 3) exactly the smallest id is kept
    out["clump"] = out.vec_id % 3
    kept = out[out.keep == 1]
    assert len(kept) == 3
    assert sorted(kept.vec_id.tolist()) == [0, 1, 2]
    # cells follow the clumps: each clump maps to a single cell
    assert (out.groupby("clump")["cell"].nunique() == 1).all()


def test_semantic_dedup_kmeans_guards_and_two_level(spark):
    """r10 ADVICE: kmeans mode must not auto-scale k into a literal
    plan — n_cells=None raises; and above 64 cells the trained
    centroids route through the two-level assignment (no thousands of
    literals) while still clustering clumps together."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (5, 8))
    ids, vecs = [], []
    for i in range(300):
        ids.append(i)
        vecs.append((centers[i % 5] + rng.normal(0, 0.01, 8)).tolist())
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": vecs})
    )
    with pytest.raises(ValueError, match="explicit n_cells"):
        semantic_dedup(df, centroid_mode="kmeans")

    out = semantic_dedup(
        df, threshold=0.999, n_cells=80, centroid_mode="kmeans"
    ).toPandas()
    assert len(out) == 300
    # keep == (max_lower_cos < threshold) everywhere
    assert (
        (out.keep == 1) == (out.max_lower_cos < 0.999)
    ).all()
    # clump members are mutually near-dup and cross-clump cosines are
    # far below threshold, so WITHIN each (cell, clump) group exactly
    # the lowest id survives — however k-means split the clumps
    out["clump"] = out.vec_id % 5
    grp = out.groupby(["cell", "clump"])
    assert (
        grp.apply(
            lambda g: g.loc[g.vec_id.idxmin(), "keep"] == 1
            and (g.drop(g.vec_id.idxmin()).keep == 0).all()
        )
    ).all()
    assert out.keep.sum() == grp.ngroups
    # deduplication really happened (cells are not singletons)
    assert out.keep.sum() < 300


def test_semantic_dedup_int8_pair_payload_parity(spark):
    """pair_payload='int8' (the shuffle-payload scale mode) must make
    IDENTICAL keep decisions to exact mode, report the bit-equal exact
    max_lower_cos for every dropped row, and stay within the quantized
    error bound for kept rows."""
    import numpy as np

    rng = np.random.default_rng(23)
    centers = rng.normal(0, 1, (4, 16))
    ids, vecs = [], []
    for i in range(240):
        base = centers[i % 4]
        # a mix of near-dups (tiny noise) and mid-similarity vectors
        # (larger noise) so pairs straddle the threshold
        noise = 0.002 if i % 3 else 0.25
        vecs.append((base + rng.normal(0, noise, 16)).tolist())
        ids.append(i)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": vecs})
    )
    exact = (
        semantic_dedup(df, threshold=0.98, n_cells=4)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    q8 = (
        semantic_dedup(df, threshold=0.98, n_cells=4, pair_payload="int8")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (exact["cell"] == q8["cell"]).all()
    # keep decisions identical everywhere
    assert (exact["keep"] == q8["keep"]).all()
    dropped = exact.index[exact["keep"] == 0]
    kept = exact.index[exact["keep"] == 1]
    assert len(dropped) > 20 and len(kept) > 3
    # dropped rows: bit-equal exact max (same float expression)
    assert (
        exact.loc[dropped, "max_lower_cos"].to_numpy()
        == q8.loc[dropped, "max_lower_cos"].to_numpy()
    ).all()
    # kept rows: estimate within the int8 quantization bound of truth
    # (16-dim unit-ish vectors: bound ~ sqrt(d)/127 ~ 0.032; allow 2x)
    diff = (
        exact.loc[kept, "max_lower_cos"] - q8.loc[kept, "max_lower_cos"]
    ).abs()
    assert float(diff.max()) < 0.07
    # and the keep invariant holds on the reported values
    assert (q8.loc[kept, "max_lower_cos"] < 0.98).all()


def test_write_training_shards_layout(spark, tmp_path_factory):
    """One file per (epoch, shard) directory; in-file row order == pos
    order; every doc present exactly once per epoch."""
    import glob
    import os

    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        write_training_shards,
    )

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id")).alias("text"),
    )
    path = str(tmp_path_factory.mktemp("shards") / "train")
    write_training_shards(docs, path, n_epochs=2, n_shards=4)

    dirs = sorted(glob.glob(os.path.join(path, "epoch=*", "shard=*")))
    assert len(dirs) == 8
    total = 0
    for d in dirs:
        files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
        assert len(files) == 1, d  # one task -> one file per shard
        pdf = pd.read_parquet(files[0])
        total += len(pdf)
        # file order IS the training order
        assert pdf["pos"].tolist() == sorted(pdf["pos"].tolist())
        assert pdf["pos"].tolist() == list(range(1, len(pdf) + 1))
    assert total == 200
    back = spark.read.parquet(path)
    assert back.groupBy("epoch").count().orderBy("epoch").collect()[0]["count"] == 100


def test_corpus_drift_shares_and_tvd(spark):
    from time_series_data_anomaly_detection_spark.datapipe import corpus_drift

    def mk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        )

    base = mk(
        [(i, "web" if i < 6 else "books", f"document body number {i}") for i in range(10)]
    )
    # snapshot: books vanished, a new source appeared, web doubled share
    snap = mk(
        [(100 + i, "web", f"fresh crawl text {i}") for i in range(4)]
        + [(200, "forums", "a brand new source appears")]
    )
    out = {r["source"]: r for r in corpus_drift(base, snap).collect()}
    assert set(out) == {"web", "books", "forums"}
    assert out["web"]["docs_base"] == 6 and out["web"]["docs_snap"] == 4
    assert out["books"]["docs_snap"] == 0
    assert out["books"]["doc_share_snap"] == 0.0
    assert out["forums"]["docs_base"] == 0
    assert out["web"]["doc_share_base"] == pytest.approx(0.6)
    assert out["web"]["doc_share_snap"] == pytest.approx(0.8)
    # TVD of the mix: (|0.8-0.6| + |0-0.4| + |0.2-0|) / 2 = 0.4
    tvd = sum(r["tv_term"] for r in out.values())
    assert tvd == pytest.approx(0.4, abs=1e-9)


def test_pq_topk_recall_on_clustered_vectors(spark):
    """PQ/ADC top-k on well-clustered data must recover most exact
    neighbors even at 16-bit codes, and emit at most k per query."""
    import numpy as np

    from time_series_data_anomaly_detection_spark.datapipe import (
        cosine_topk,
        pq_topk,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(0, 1, (8, 64))
    vecs = [
        (centers[i % 8] + rng.normal(0, 0.02, 64)).tolist() for i in range(96)
    ]
    e = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(96), "embedding": vecs})
    )
    q = e.filter("vec_id < 6")
    exact = cosine_topk(e, q, k=3).toPandas()
    approx = pq_topk(e, q, k=3, m=4, n_codes=16).toPandas()
    assert (approx.groupby("query_id").size() <= 3).all()
    # quantization collapses a clump onto its codeword, so PQ cannot
    # rank WITHIN a clump — the correct property is that every
    # retrieved neighbor comes from the query's clump (codes match),
    # exactly like the exact top-k does on well-separated clusters
    assert ((exact.match_id % 8) == (exact.query_id % 8)).all()
    assert ((approx.match_id % 8) == (approx.query_id % 8)).all()
    # and the reconstructed distance of a same-clump neighbor is tiny
    # next to the inter-cluster scale (centers are N(0,1) in 64-d)
    assert approx["adist"].max() < 1.0


def test_pack_bins_ffd_matches_python_reference(spark):
    """FFD no-split packing: agrees bin-for-bin with a pure-Python
    first-fit-decreasing; no bin over ctx except flagged oversize
    singletons; repartition-stable."""
    import numpy as np

    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        pack_bins_ffd,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        n = int(rng.integers(1, 40)) if i != 13 else 70  # one oversize
        rows.append((i, "s%d" % (i % 2), "tok " * n))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    out = pack_bins_ffd(df, ctx=50).toPandas()

    # python reference per shard
    def ref(items, ctx=50):
        items = sorted(items, key=lambda t: (-t[1], t[0]))
        fills, assign = [], {}
        for did, n in items:
            if n > ctx:
                fills.append(n)
                assign[did] = (len(fills) - 1, 1)
                continue
            for b, used in enumerate(fills):
                if used + n <= ctx:
                    fills[b] = used + n
                    assign[did] = (b, 0)
                    break
            else:
                fills.append(n)
                assign[did] = (len(fills) - 1, 0)
        return assign

    for shard, g in out.groupby("shard"):
        items = list(zip(g["doc_id"], g["n_tok"]))
        expect = ref(items)
        for _, r in g.iterrows():
            assert expect[r["doc_id"]] == (r["bin_id"], r["oversize"]), r
        # capacity invariant
        agg = g.groupby("bin_id").agg(tok=("n_tok", "sum"), ov=("oversize", "max"))
        assert ((agg["tok"] <= 50) | (agg["ov"] == 1)).all()
    # oversize doc got its own bin
    ov = out[out.oversize == 1]
    assert len(ov) == 1 and ov.iloc[0]["doc_id"] == 13
    # repartition-stable
    out2 = pack_bins_ffd(df.repartition(5), ctx=50).toPandas()
    a = out.sort_values(["shard", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["shard", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_semantic_dedup_ladder(spark):
    from time_series_data_anomaly_detection_spark.datapipe.similarity import (
        incremental_semantic_dedup,
    )

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (100, [1.0, 0.05]),    # ~ corpus 0 -> near_dup_of_corpus
            (101, [-0.6, 0.8]),    # cell 1, far from corpus
            (102, [-0.59, 0.81]),  # ~ batch 101 -> near_dup_in_batch
            (103, [0.1, -1.0]),    # far from everything -> new
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in incremental_semantic_dedup(
            corpus, batch, threshold=0.95, n_cells=2
        ).collect()
    }
    assert set(out) == {100, 101, 102, 103}
    assert out[100]["verdict"] == "near_dup_of_corpus"
    assert out[100]["max_corpus_cos"] > 0.95
    assert out[101]["verdict"] == "new"
    assert out[102]["verdict"] == "near_dup_in_batch"
    assert out[102]["max_batch_cos"] > 0.99
    assert out[103]["verdict"] == "new"
    # ladder priority: corpus beats batch when both fire
    batch2 = spark.createDataFrame(
        [(200, [1.0, 0.01]), (201, [1.0, 0.02])],
        "vec_id long, embedding array<double>",
    )
    out2 = {
        r["vec_id"]: r["verdict"]
        for r in incremental_semantic_dedup(
            corpus, batch2, threshold=0.95, n_cells=2
        ).collect()
    }
    assert out2[200] == "near_dup_of_corpus"
    assert out2[201] == "near_dup_of_corpus"  # corpus rung wins over batch


def test_chunk_documents_overlap_and_coverage(spark):
    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        chunk_documents,
    )

    docs = _docs(
        spark,
        [
            (0, " ".join(f"t{i}" for i in range(100))),  # 100 tokens
            (1, "short doc only"),                        # 3 tokens
            (2, " ".join(f"w{i}" for i in range(112))),  # exact 2 chunks
        ],
    )
    out = chunk_documents(docs, ctx=64, overlap=16).toPandas()
    g0 = out[out.doc_id == 0].sort_values("chunk_id")
    assert g0["start_tok"].tolist() == [1, 49]
    assert g0["end_tok"].tolist() == [64, 100]
    # consecutive chunks overlap by exactly 16 tokens
    assert g0["end_tok"].iloc[0] - g0["start_tok"].iloc[1] + 1 == 16
    # full coverage: last chunk reaches the last token
    assert g0["end_tok"].iloc[-1] == 100
    g1 = out[out.doc_id == 1]
    assert len(g1) == 1 and g1.iloc[0]["n_tok_in_chunk"] == 3
    g2 = out[out.doc_id == 2]
    assert g2["end_tok"].tolist() == [64, 112]
    # distinct spans hash distinctly; same span would hash equal
    assert out["chunk_hash"].nunique() == len(out)


def test_retention_cohorts_matrix(spark):
    from time_series_data_anomaly_detection_spark.datapipe.events import (
        retention_cohorts,
    )

    # user 1: periods 0,1,3; user 2: periods 0,2; user 3: period 1 only
    rows = [
        (1, 10), (1, 110), (1, 310), (1, 15),
        (2, 20), (2, 220),
        (3, 130),
    ]
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts_s long",
    )
    out = {
        (r["cohort"], r["offset"]): r
        for r in retention_cohorts(df, period_seconds=100).collect()
    }
    # cohort 0 = users 1,2 (size 2); cohort 1 = user 3 (size 1)
    assert out[(0, 0)]["cohort_size"] == 2 and out[(0, 0)]["n_active"] == 2
    assert out[(0, 1)]["n_active"] == 1  # only user 1 active period 1
    assert out[(0, 2)]["n_active"] == 1  # only user 2
    assert out[(0, 3)]["n_active"] == 1  # only user 1
    assert out[(0, 1)]["retention"] == 0.5
    assert out[(1, 0)]["cohort_size"] == 1 and out[(1, 0)]["retention"] == 1.0
    assert set(out) == {(0, 0), (0, 1), (0, 2), (0, 3), (1, 0)}


def test_embedding_density_ranks_dense_regions(spark):
    """A clustered clump scores higher density than an isolated
    vector; a vector alone in its bucket reports -1."""
    import numpy as np

    from time_series_data_anomaly_detection_spark.datapipe.similarity import (
        embedding_density,
    )

    rng = np.random.default_rng(9)
    rows = []
    # dense clump: 10 near-copies in the all-positive orthant
    base = np.abs(rng.normal(1, 0.1, 8))
    for i in range(10):
        rows.append((i, (base + rng.normal(0, 0.01, 8)).tolist()))
    # sparse singleton in the all-negative orthant (own bucket)
    rows.append((99, (-np.abs(rng.normal(1, 0.1, 8))).tolist()))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    )
    out = {r["vec_id"]: r for r in embedding_density(df, k=3, bucket_bits=4).collect()}
    for i in range(10):
        assert out[i]["density"] > 0.99 and out[i]["n_neighbors"] == 3
    assert out[99]["n_neighbors"] == 0 and out[99]["density"] == -1.0
