"""Corpus-level operators: the end products of a training-data
pipeline — n-gram statistics, the quality/dedup filter funnel, and
per-source reporting.

Shapes chosen for 100 TB:
- n-gram counting is the canonical map-side-combinable aggregation:
  explode → hash-partition on the gram → count; ``top_k`` applies a
  per-partition partial top-k (rank window AFTER the full aggregate —
  the count agg has already collapsed cardinality to |vocab|^n).
- the corpus filter is one projection + one dedup join: quality gates
  evaluate inline (no shuffle); the exact-dup survivor join is the
  only wide stage.
- source stats are a straight groupBy over computed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .text import doc_stats, grams, lang_id, tokenize


def ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide n-gram frequency table: (ngram, count, doc_freq)."""
    # repartition before the gram explode (see dedup.shingles): the
    # few-split corpus scan would otherwise serialize the explosion
    t = tokenize(df.repartition(F.col("doc_id")), text_col)
    tall = t.select(F.explode(grams(n)).alias("ngram"), F.col("doc_id"))
    out = tall.groupBy("ngram").agg(
        F.count("*").alias("count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return out.filter(F.col("count") >= min_count)


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k n-grams by count (ties broken lexicographically — full
    determinism for the oracle).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    per-partition partial top-k merged on the driver — so the full
    vocabulary is never sorted in one partition (the previous global
    rank Window single-partitioned the whole vocab; at corpus scale
    that table is huge).  The rank window runs AFTER the limit, on k
    rows."""
    counts = ngram_counts(df, n, text_col)
    top = counts.orderBy(F.desc("count"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("count"), F.asc("ngram"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "ngram", "count", "doc_freq"
    )


def corpus_filter(
    df: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The pretraining filter funnel: quality gate + token-length gate
    + language gate + exact-dup removal, with a per-doc ``verdict``
    column naming the FIRST failed gate (kept docs say 'keep') —
    the funnel report and the filtered corpus in one result.
    """
    stats = doc_stats(df, text_col)
    lid = lang_id(df, text_col).select(id_col, "lang_pred")
    dup = exact_dedup(df, text_col, id_col).select(id_col, "keep")
    joined = (
        stats.join(lid, id_col)
        .join(dup, id_col)
        .withColumn(
            "verdict",
            F.when(F.col("keep") == 0, F.lit("duplicate"))
            .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
            .when(~F.col("lang_pred").isin(*langs), F.lit("wrong_lang"))
            .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
            .otherwise(F.lit("keep")),
        )
    )
    return joined.select(
        id_col, "n_tokens", "quality_score", "lang_pred", "verdict"
    )


def source_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus report: doc count, token volume, mean quality
    — the partition-pruning dimension a curated lake reports on.

    ``mean_quality`` averages doubles through an exact decimal sum
    (order/engine-independent — see ``_exact.py``); integer means are
    exact already."""
    from .._exact import DEC

    stats = doc_stats(df, text_col)
    return stats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / F.count("*")).alias("mean_tokens"),
        (
            F.sum(F.col("quality_score").cast(DEC)).cast("double") / F.count("*")
        ).alias("mean_quality"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def corpus_prep(
    df: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The FULL pretraining prep funnel — :func:`corpus_filter`'s gates
    plus the transitive NEAR-dup cluster stage — in one audit frame.
    This is the composite a corpus team actually runs: one query, one
    verdict per document, ladder ordered by severity::

        duplicate       exact content digest, non-canonical member
        near_duplicate  MinHash-LSH cluster (transitive), non-canonical
        too_short / wrong_lang / low_quality
        keep

    Every gate is evaluated over the full corpus (audit semantics —
    the frame shows which stage would kill each doc), with the verdict
    naming the FIRST failure.  Scale shape: four independent branches
    over the corpus scan (token stats, language, exact digest, LSH
    clusters — each individually hash-gated as its own query), joined
    on the doc id; the only iterative piece is the near-dup label
    propagation, already lineage-bounded and skew-guarded.
    """
    from .dedup import near_dup_clusters

    stats = doc_stats(df, text_col)
    lid = lang_id(df, text_col).select(id_col, "lang_pred")
    dup = exact_dedup(df, text_col, id_col).select(id_col, "keep")
    nd = near_dup_clusters(
        df, n=n, threshold=jaccard_threshold, text_col=text_col,
        id_col=id_col,
    ).select(
        id_col, "cluster_id", "cluster_size",
        F.col("keep").alias("nd_keep"),
    )
    joined = (
        stats.join(lid, id_col)
        .join(dup, id_col)
        .join(nd, id_col)
        .withColumn(
            "verdict",
            F.when(F.col("keep") == 0, F.lit("duplicate"))
            .when(F.col("nd_keep") == 0, F.lit("near_duplicate"))
            .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
            .when(~F.col("lang_pred").isin(*langs), F.lit("wrong_lang"))
            .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
            .otherwise(F.lit("keep")),
        )
    )
    return joined.select(
        id_col, "n_tokens", "quality_score", "lang_pred",
        "cluster_id", "cluster_size", "verdict",
    )


def corpus_drift(
    baseline: DataFrame,
    snapshot: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift report between two corpus snapshots — the
    monitoring query a lake team runs after every ingest wave: did the
    source mix, token mix, or per-source quality move?

    Per stratum (full outer over both sides):

    - doc/token counts and SHARES on each side;
    - ``share_ratio`` — snapshot doc share over baseline doc share;
    - ``quality_delta`` — mean-quality movement;
    - ``tv_term`` — |share_snap − share_base| / 2; summing the column
      gives the total-variation distance of the source mix, a bounded
      [0, 1] drift score.

    All algebra is exact (integer counts, decimal quality sums, double
    division) — deliberately NO transcendental functions (KL's ln
    differs in the last ulp between engines), so the report is
    bit-stable and oracle-checkable.  Scale: one aggregate per side
    into O(strata) rows; the share windows and the join run on those
    tiny frames, never on the corpus.
    """
    from pyspark.sql import Window

    w = Window.partitionBy()  # O(strata) rows — safe single partition

    def side(df, suffix):
        s = source_stats(df, text_col).select(
            F.col(strata_col).alias("stratum"),
            F.col("n_docs").alias(f"docs_{suffix}"),
            F.col("total_tokens").alias(f"tokens_{suffix}"),
            F.col("mean_quality").alias(f"quality_{suffix}"),
        )
        return s.select(
            "*",
            (
                F.col(f"docs_{suffix}")
                / F.sum(f"docs_{suffix}").over(w)
            ).alias(f"doc_share_{suffix}"),
            (
                F.col(f"tokens_{suffix}")
                / F.sum(f"tokens_{suffix}").over(w)
            ).alias(f"tok_share_{suffix}"),
        )

    b, s = side(baseline, "base"), side(snapshot, "snap")
    j = b.join(s, "stratum", "full_outer")

    def z(c):  # absent stratum -> zero share/count
        return F.coalesce(F.col(c), F.lit(0.0))

    return j.select(
        F.col("stratum").alias(strata_col),
        F.coalesce("docs_base", F.lit(0)).cast("long").alias("docs_base"),
        F.coalesce("docs_snap", F.lit(0)).cast("long").alias("docs_snap"),
        z("doc_share_base").alias("doc_share_base"),
        z("doc_share_snap").alias("doc_share_snap"),
        z("tok_share_base").alias("tok_share_base"),
        z("tok_share_snap").alias("tok_share_snap"),
        (z("doc_share_snap") / (z("doc_share_base") + F.lit(1e-12))).alias(
            "share_ratio"
        ),
        (z("quality_snap") - z("quality_base")).alias("quality_delta"),
        (F.abs(z("doc_share_snap") - z("doc_share_base")) / F.lit(2.0)).alias(
            "tv_term"
        ),
    )


def quality_classifier(
    df: DataFrame,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frozen-weight linear quality classifier — the model-based
    quality filter as it actually runs at 100 TB: a classifier trained
    OFFLINE (weights frozen as literals) applied map-side to every
    doc, zero shuffle, no model server.

    Features are the ``doc_stats`` signals (length saturation,
    stopword density, lexical diversity, token shape); the margin is a
    fixed-order dot product with dyadic-rational weights so both
    engines evaluate the identical double tree.  The decision
    ``margin > threshold`` is equivalent to thresholding the logistic
    probability (sigmoid is monotone), so no transcendental enters
    the gate.

    Returns ``doc_id, margin, keep``.
    """
    stats = doc_stats(df, text_col)
    margin = (
        F.lit(-1.5)
        + F.lit(2.0)
        * F.least(F.col("n_tokens") / F.lit(256.0), F.lit(1.0))
        + F.lit(1.5)
        * F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0))
        + F.lit(1.25) * F.col("unique_ratio")
        + F.lit(0.25)
        * F.least(F.col("mean_token_len") / F.lit(8.0), F.lit(1.0))
    )
    return stats.select(
        id_col,
        margin.alias("margin"),
        (margin > F.lit(float(threshold))).cast("int").alias("keep"),
    )


VOCAB_KS = (100, 1000, 10000)


def vocab_coverage(
    df: DataFrame,
    ks: tuple[int, ...] = VOCAB_KS,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage curve: for each candidate vocab size K,
    the fraction of all corpus token OCCURRENCES covered by the K most
    frequent token types — the number that sizes a tokenizer vocab
    (coverage at 10k says how much of the stream falls back to
    unk/bytes).

    One explode + one groupBy gives the type-frequency table, which is
    DIMENSION-sized (≤ vocab, not corpus): the global rank over it is
    a sort of ~1M rows at web scale, trivially done after the corpus
    was reduced.  Ranking ties break by token text; coverage divides
    exact integer sums.

    Output per K: ``k, n_vocab, total_tokens, covered_tokens,
    coverage``.
    """
    toks = tokenize(df, text_col).select(
        F.explode("tokens").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = freq.select(
        "freq", F.row_number().over(w).alias("rk")
    )
    totals = ranked.agg(
        F.count("*").alias("n_vocab"),
        F.sum("freq").alias("total_tokens"),
    )
    per_k = [
        ranked.filter(F.col("rk") <= F.lit(int(k))).agg(
            F.lit(int(k)).alias("k"),
            F.sum("freq").alias("covered_tokens"),
        )
        for k in ks
    ]
    cov = per_k[0]
    for p in per_k[1:]:
        cov = cov.unionByName(p)
    return cov.crossJoin(F.broadcast(totals)).select(
        "k",
        "n_vocab",
        "total_tokens",
        F.coalesce(F.col("covered_tokens"), F.lit(0)).alias(
            "covered_tokens"
        ),
        (
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            * F.lit(1.0) / F.col("total_tokens")
        ).alias("coverage"),
    )


def distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Top-``top_k`` DISTINCTIVE tokens per ``group_col`` — tf-idf in
    pure rational form: ``score = tf_g · N_docs / df`` (term frequency
    within the group times inverse document frequency across the
    corpus), which preserves the tf-idf ORDERING without the
    transcendental ``log`` that would break cross-engine hashing.
    The source-mix diagnostic beside :func:`corpus_drift`: what makes
    each source's vocabulary different, not just bigger.

    Terms must appear in ≥ ``min_df`` documents (drops hapax noise);
    ties break on token text for determinism.

    Scale shape: explode → (group, token) tf aggregate with map-side
    combine, a corpus-wide per-token document-frequency aggregate
    (broadcast back), one rank window over the per-group token table
    (keyed by group — no global sort).
    """
    toks = tokenize(df, text_col).select(
        group_col, "doc_id", F.explode("tokens").alias("token")
    )
    tf = toks.groupBy(group_col, "token").agg(F.count("*").alias("tf"))
    dfreq = toks.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count("*").alias("df")
    )
    n_docs = df.count()
    scored = (
        tf.join(dfreq.filter(F.col("df") >= int(min_df)), "token")
        .withColumn(
            "score",
            F.col("tf") * F.lit(int(n_docs)) / F.col("df"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= int(top_k))
        .select(group_col, "term_rank", "token", "tf", "df", "score")
    )


def doc_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct word
    n-gram shingles that appear in NO other document — the
    template/boilerplate detector dual to near-dup scoring (a doc of
    novelty ~0 is assembled entirely from corpus-shared fragments even
    when no single pair-wise match crosses a dedup threshold).

    ``novelty = 1 − n_shared/n_shingles`` where ``n_shared`` counts
    shingles with corpus document-frequency ≥ 2 — integers end to end.
    Docs too short to form a shingle carry nulls.

    Scale shape: the shared :func:`~..dedup.shingles` projection
    (hash-only), one document-frequency aggregate on the shingle hash
    (map-side partial combine absorbs the Zipf head), one per-doc
    rollup.  No pair join anywhere — this is the O(corpus) summary
    the pair generators sit on top of.
    """
    from .dedup import shingles

    sh = shingles(df, n=n, text_col=text_col, id_col=id_col)
    dfreq = sh.groupBy("shingle_hash").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(dfreq, "shingle_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        "n_shingles",
        "n_shared",
        (1.0 - F.col("n_shared") / F.col("n_shingles")).alias("novelty"),
    )


def source_concentration(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Gini concentration of the corpus across sources — the
    source-imbalance number behind the mixture planner
    (:func:`~..sampling.source_mix`): 0 = perfectly balanced corpus,
    →1 = one source dominates.  Computed for both doc counts and
    token counts via the sorted-cumulative form::

        G = (2·Σᵢ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n    (x sorted ascending)

    — pure integer sums over the (tiny) per-source table, so the
    whole report is hash-exact.

    Returns one row: ``n_sources, total_docs, total_tokens,
    gini_docs, gini_tokens``.
    """
    toks = tokenize(df, text_col).select(
        group_col, F.size("tokens").alias("__nt")
    )
    per = toks.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
    )

    docs_ranked = per.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.col("n_docs").asc(), F.col(group_col).asc())
        ),
    )
    g_docs = docs_ranked.agg(
        F.count("*").alias("n_sources"),
        F.sum("n_docs").alias("total_docs"),
        (
            F.lit(2.0) * F.sum(F.col("__rk") * F.col("n_docs"))
            / (F.count("*") * F.sum("n_docs"))
            - (F.count("*") + F.lit(1.0)) / F.count("*")
        ).alias("gini_docs"),
    )
    toks_ranked = per.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(
                F.col("n_tokens").asc(), F.col(group_col).asc()
            )
        ),
    )
    g_toks = toks_ranked.agg(
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.lit(2.0) * F.sum(F.col("__rk") * F.col("n_tokens"))
            / (F.count("*") * F.sum("n_tokens"))
            - (F.count("*") + F.lit(1.0)) / F.count("*")
        ).alias("gini_tokens"),
    )
    return g_docs.crossJoin(g_toks).select(
        "n_sources", "total_docs", "total_tokens",
        "gini_docs", "gini_tokens",
    )
