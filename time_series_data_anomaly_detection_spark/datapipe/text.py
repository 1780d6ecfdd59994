"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All native ``pyspark.sql.functions`` — no Python UDFs anywhere, so the
whole stage stays inside whole-stage codegen and scales linearly with
input splits (no shuffle at all for per-document ops).

Portable hashing: ``hash48(x) = int(md5(x)[:12], 16)`` evaluates
identically in Spark (``conv(substring(md5(x),1,12),16,10)``) and
DuckDB (``CAST('0x'||substr(md5(x),1,12) AS BIGINT)``), giving a
48-bit value that survives 64-bit arithmetic (a*h+b) without overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word-ish runs OR single punctuation — a BPE-ish pre-tokenizer split
TOKEN_RE = r"[a-z0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# characteristic function words per language for the n-gram/marker
# heuristic (deterministic, content-based — NOT the metadata column)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
    "de": ("der", "die", "und", "das", "ein"),
}


def hash48(col: Column) -> Column:
    """Portable 48-bit hash (md5 prefix), identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def grams(n: int, tokens_col: str = "tokens") -> Column:
    """Word n-gram array over a ``tokens`` array column.

    Guards docs shorter than n tokens: Spark's ``sequence(1, 0)``
    counts DOWN ([1, 0] — unlike DuckDB's empty generate_series) and
    the 0 then crashes ``slice()``; short docs must yield ZERO grams
    on both engines.  The single definition keeps every gram producer
    (shingles, ngram_counts) on identical semantics.
    """
    col = F.col(tokens_col)
    return F.when(
        F.size(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercase + regex pre-tokenization into a ``tokens`` array column."""
    return df.withColumn(
        "tokens", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + quality scoring (length / stopword / diversity
    ratios) — the classic pretraining-corpus quality filters.

    quality_score is a deterministic [0,1] blend: penalizes very short
    docs, zero-stopword docs (non-linguistic), and low lexical
    diversity (boilerplate / repetition).
    """
    t = tokenize(df, text_col)
    n_tok = F.size("tokens")
    n_stop = F.size(F.filter("tokens", lambda x: x.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct("tokens"))
    stop_ratio = n_stop / (n_tok + F.lit(1e-9))
    uniq_ratio = n_uniq / (n_tok + F.lit(1e-9))
    mean_len = F.aggregate(
        "tokens", F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / (n_tok + F.lit(1e-9))
    quality = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + uniq_ratio * 0.3
    )
    return t.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_computed"),
        n_uniq.alias("n_unique_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        mean_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by its
    characteristic-function-word hit count over the token bag; argmax
    with deterministic tie-break (score desc, language asc), fallback
    'und' when no marker hits at all.

    Scale note: per-row map over an array column — no shuffle, no UDF.
    """
    t = tokenize(df, text_col)

    def _hits(markers):
        return lambda x: x.isin(*markers)

    scores = [
        F.size(F.filter("tokens", _hits(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    t = t.select(*df.columns, *scores)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in LANG_MARKERS
        ]
    )
    # max score, ties by lexicographically smallest lang: sort by
    # (-score, lang) ascending and take the head
    best = F.sort_array(
        F.transform(
            pairs,
            lambda p: F.struct(
                (-p["score"]).alias("neg"), p["lang"].alias("lang"), p["score"].alias("score")
            ),
        )
    )[0]
    return t.select(
        *df.columns,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["score"].alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized (lowercased,
    whitespace-collapsed) text, plus the portable 48-bit int form.

    The normalization makes near-identical docs (case / spacing drift)
    collide — the cheap first pass before MinHash.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(
        *df.columns,
        F.md5(norm).alias("fingerprint"),
        hash48(norm).alias("fingerprint_int"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every character k-gram, slide a ``window``-wide frame over the
    hash sequence, keep each window's MINIMUM hash — the classic
    rolling-hash fingerprint whose selected set is guaranteed to share
    members for any sufficiently long common substring between
    documents (unlike a whole-document digest, which only catches exact
    duplicates).

    Output: one row per distinct selected hash per doc —
    ``(doc_id, fp_hash, first_pos)`` with the 1-based position of that
    k-gram's first occurrence.  Deterministic (min over the frame;
    first occurrence for position), hence oracle-checkable.

    Scale shape: posexplode of k-gram hashes (rows = chars per doc), a
    single ordered window per doc for the rolling min, then a
    distinct + self-join on the 48-bit hash — all native, no UDF; the
    per-doc window partitions by document, so parallelism is document
    count, the natural axis for corpus work.
    """
    from pyspark.sql import Window

    # repartition by doc BEFORE the gram explosion: the corpus arrives
    # in a handful of parquet splits, and exploding ~chars-per-doc rows
    # with an md5 each inside the scan stage would serialize the
    # dominant cost on those few tasks (measured 10s -> 3s at sf0.1).
    # Hash-partitioning on the doc id also pre-satisfies the rolling
    # window's clustering, so no second exchange appears.
    df = df.repartition(F.col(id_col))
    # k-gram extraction via expr: transform positions -> substring
    # (the lambda form can't close over the sibling text column)
    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - {k - 1},"
                f" 0)), i -> substring({text_col}, i, {k}))"
            )
        ).alias("__i", "__g"),
    ).select(
        id_col,
        (F.col("__i") + 1).alias("pos"),  # 1-based k-gram position
        hash48(F.col("__g")).alias("gh"),
    )
    # grams feed the rolling-min pass AND the first-position lookup —
    # cache so the k-gram md5 projection (the dominant per-row cost)
    # runs once
    from ..session import tracked_cache

    grams = tracked_cache(grams)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    wins = (
        grams.withColumn("wmin", F.min("gh").over(w))
        .filter(F.col("pos") >= window)  # full windows only
        .select(id_col, F.col("wmin").alias("fp_hash"))
        .distinct()
    )
    # first occurrence per SELECTED hash only: broadcast the (small)
    # selected set into the gram stream and aggregate just the matching
    # rows — a doc-global groupBy over all grams would aggregate ~one
    # group per gram (near-unique keys), the most expensive possible
    # shape for information we need on ~1/window of the hashes
    g = grams.alias("g")
    wv = wins.alias("wv")
    sel = g.join(
        F.broadcast(wv),
        (F.col(f"g.{id_col}") == F.col(f"wv.{id_col}"))
        & (F.col("g.gh") == F.col("wv.fp_hash")),
    ).select(
        F.col(f"g.{id_col}").alias(id_col),
        F.col("g.gh").alias("gh"),
        F.col("g.pos").alias("pos"),
    )
    return (
        sel.groupBy(id_col, "gh")
        .agg(F.min("pos").alias("first_pos"))
        .select(id_col, F.col("gh").alias("fp_hash"), "first_pos")
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` vocabulary profile: document/token/type
    counts, hapax legomena (types seen once in the group), type-token
    ratio and hapax share — the classic corpus-health diagnostics
    (vocabulary collapse flags over-deduplication; a hapax explosion
    flags OCR noise or encoding corruption) tracked alongside
    ``corpus_drift`` in a training-data pipeline.

    Everything is integer counting over the shared :func:`tokenize`
    projection, so the whole report is hash-gateable; the two ratios
    are single integer divisions rounded at the output.

    Scale shape: explode → two-stage aggregate with map-side partial
    combine on ``(group, token)`` (the natural key — no hot groups
    beyond Zipf's head, which partial aggregation absorbs), then a
    per-group rollup of the token table.  No window, no join besides
    the broadcast-sized doc counts.
    """
    toks = tokenize(df, text_col).select(
        group_col, F.explode("tokens").alias("token")
    )
    tok_counts = toks.groupBy(group_col, "token").agg(
        F.count("*").alias("cnt")
    )
    per_group = tok_counts.groupBy(group_col).agg(
        F.count("*").alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.max("cnt").alias("top_token_count"),
    )
    docs = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    out = per_group.join(F.broadcast(docs), group_col)
    return out.select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_types",
        "n_hapax",
        "top_token_count",
        (F.col("n_types") / F.col("n_tokens")).alias("type_token_ratio"),
        (F.col("n_hapax") / F.col("n_types")).alias("hapax_ratio"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the language-agnostic
    repetition/quality signal used by large-corpus filters (highly
    compressible ≈ templated/repetitive; incompressible ≈ binary noise
    or already-compressed junk): complements the n-gram repetition
    signals in ``decontam.repetition_signals`` with a measure that
    catches long-range structure n-grams miss.

    ``ratio = compressed_bytes / raw_bytes`` (UTF-8), deterministic
    for a fixed zlib level — but NOT SQL-expressible, so this operator
    is rows-only in the gate with a pinned-values unit test.

    Scale shape: ``mapInPandas`` projection — zero shuffles, zero
    state; Arrow batches stream through zlib at memory-bounded cost.
    """
    import zlib

    from pyspark.sql import functions as F  # noqa: F401

    def run(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_comp = raw.map(
                lambda b: len(zlib.compress(b, level))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_raw,
                    "n_compressed": n_comp,
                    "compression_ratio": n_comp / n_raw.where(n_raw > 0),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_bytes long, n_compressed long, "
        "compression_ratio double",
    )


def bigram_surprise(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Statistical-LM quality scoring: per-document mean inverse
    add-one-smoothed bigram probability against the corpus's OWN
    bigram model — the model-based complement to the heuristic
    filters (doc_stats ratios, quality_classifier) and to DSIR's
    target-vs-corpus importance weights (sampling.importance_select):
    here there is no target corpus, the signal is "how surprising is
    this document under the corpus itself" (high = boilerplate-free
    but also OCR noise / word salad; low = templated text).

    Rational form (the house hash-exactness recipe): with
    ``P(w2|w1) = (c12 + 1) / (c1 + V)`` (add-one smoothing, V =
    corpus vocabulary size, c1 = Σ_w2 c12 so the conditional is
    exactly normalized), the score is the ARITHMETIC mean of
    ``1/P`` over a doc's bigram occurrences — a sum of integer
    ratios, exact-decimal summable, no logs.  (The geometric mean —
    true perplexity — needs log and stays out of hash gates by
    design; the arithmetic mean is the documented variant.)

    Scale shape: occurrences collapse to per-(doc, bigram) counts
    BEFORE the model join, so a hot bigram ("of the") joins once per
    containing doc, not once per occurrence; both model joins are
    keyed shuffle joins (AQE handles residual key skew); V is a
    scalar broadcast.  Three aggregates, all with map-side combine —
    corpus scanned once.
    """
    from .._exact import DEC

    t = tokenize(df, text_col).select("doc_id", "tokens")
    occ = (
        t.select("doc_id", F.explode(grams(2)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("m"))
    )
    model = occ.groupBy("bg").agg(F.sum("m").alias("c12"))
    c1 = (
        model.withColumn(
            "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        )
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    v = t.select(F.explode("tokens").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    sc = (
        occ.join(model, "bg")
        .withColumn(
            "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        )
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "inv_p",
            (F.col("c1") + F.col("v")) / (F.col("c12") + F.lit(1)),
        )
    )
    return sc.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        (
            F.sum((F.col("m") * F.col("inv_p")).cast(DEC)).cast("double")
            / F.sum("m")
        ).alias("surprise"),
    )
