"""SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003)
with rare-word anomaly flags (the TARZAN / HOT-SAX surprise idea).

Pipeline: per-series z-normalization (exact-decimal moments, the
``global_zscore`` algebra) → PAA (piecewise aggregate approximation:
the mean of each ``seg_len``-row block, an exact-decimal segment sum)
→ symbol per segment by Gaussian-quantile breakpoints (hard literals,
so the only float compare is against a constant on bit-identical
inputs) → sliding SAX word of ``word_len`` consecutive symbols →
word-frequency rarity: a segment whose word occurs in < 1/``rare_x``
of the series' words is flagged.  The rarity compare is pure INTEGER
(``freq · rare_x < n_words``) — nothing to drift cross-engine.

Why it's in the engine: symbolization is the scale move for pattern
mining — it maps an unbounded-precision series onto a tiny alphabet
where counting (the thing a warehouse is good at) replaces geometry.
The whole operator is native SQL algebra: two broadcast-sized
aggregates (per-series moments, per-(series, word) counts) around one
window pass for the word construction; no UDF, no per-series loop.
At 100 TB the axis is series count × segments, and every intermediate
is a projection of the one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC

# Gaussian equiprobable breakpoints for alphabet sizes 3..6 (Lin et
# al., Table 3) — hard literals shared verbatim with the oracle SQL.
BREAKPOINTS = {
    3: (-0.43, 0.43),
    4: (-0.67, 0.0, 0.67),
    5: (-0.84, -0.25, 0.25, 0.84),
    6: (-0.97, -0.43, 0.0, 0.43, 0.97),
}
ALPHA = "abcdef"
EPS_Z = 1e-9


def _sax_symbols(
    df: DataFrame, value_col: str, seg_len: int, alphabet: int
) -> DataFrame:
    """Shared SAX front half: exact-moment z-normalize → PAA segment
    means → Gaussian-breakpoint symbols.  Returns one row per segment:
    ``(series_id, seg, paa, symbol)``."""
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    bps = BREAKPOINTS[alphabet]

    v = F.col(value_col)
    mo = df.groupBy("series_id").agg(
        F.count(value_col).alias("__n"),
        F.sum(v.cast(DEC)).cast("double").alias("__s1"),
        F.sum((v * v).cast(DEC)).cast("double").alias("__s2"),
    )
    mo = mo.select(
        "series_id",
        (F.col("__s1") / F.col("__n")).alias("__mu"),
        F.sqrt(
            F.greatest(
                (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n"))
                / (F.col("__n") - 1),
                F.lit(0.0),
            )
        ).alias("__sd"),
    )
    z = df.join(F.broadcast(mo), "series_id").select(
        "series_id",
        "rn",
        ((v - F.col("__mu")) / (F.col("__sd") + F.lit(EPS_Z))).alias("__z"),
        F.floor((F.col("rn") - 1) / F.lit(seg_len)).alias("seg"),
    )
    paa = z.groupBy("series_id", "seg").agg(
        (F.sum(F.col("__z").cast(DEC)).cast("double") / F.count("*")).alias(
            "paa"
        )
    )
    # symbol = #breakpoints strictly below paa, mapped onto a..f
    sym = F.lit(ALPHA[0])
    for i, bp in enumerate(bps):
        sym = F.when(F.col("paa") >= F.lit(bp), F.lit(ALPHA[i + 1])).otherwise(
            sym
        )
    return paa.withColumn("symbol", sym)


def sax_words(
    df: DataFrame,
    value_col: str = "value",
    seg_len: int = 4,
    alphabet: int = 4,
    word_len: int = 3,
    rare_x: int = 50,
) -> DataFrame:
    """One row per complete SAX word position: ``(series_id, seg,
    paa, symbol, word, n_word, n_words, rare_flag)`` where ``seg``
    indexes ``seg_len``-row blocks, ``word`` is the concatenation of
    this and the next ``word_len - 1`` symbols, and ``rare_flag``
    marks words rarer than ``1/rare_x`` of the series' words.

    Trailing segments without a full lookahead carry no word (they are
    dropped — same convention as sliding-window extraction W4).
    Ragged final segments DO contribute a PAA mean over their actual
    rows (count-based divisor), matching the oracle bit-for-bit.
    """
    paa = _sax_symbols(df, value_col, seg_len, alphabet)
    w = Window.partitionBy("series_id").orderBy("seg")
    word = F.concat(
        *[F.lead("symbol", i).over(w) for i in range(word_len)]
    )
    worded = paa.withColumn("word", word).filter(F.col("word").isNotNull())
    freq = worded.groupBy("series_id", "word").agg(
        F.count("*").alias("n_word")
    )
    tot = worded.groupBy("series_id").agg(F.count("*").alias("n_words"))
    return (
        worded.join(F.broadcast(freq), ["series_id", "word"])
        .join(F.broadcast(tot), "series_id")
        .withColumn(
            "rare_flag",
            (F.col("n_word") * F.lit(int(rare_x)) < F.col("n_words")).cast(
                "int"
            ),
        )
        .select(
            "series_id", "seg", "paa", "symbol", "word",
            "n_word", "n_words", "rare_flag",
        )
    )


def sax_bitmap(
    df: DataFrame,
    value_col: str = "value",
    seg_len: int = 4,
    alphabet: int = 4,
    chunk_len: int = 64,
    top_frac: float = 0.05,
) -> DataFrame:
    """SAX bitmap anomaly distance (Wei, Keogh et al. SDM'05
    "Assumption-free anomaly detection in time series").

    The series' SAX symbols are cut into ``chunk_len``-segment chunks;
    each chunk's "bitmap" is its symbol-BIGRAM count vector (``α²``
    bins), and consecutive chunks are scored by the squared euclidean
    distance between their bitmaps.  A regime change (new shape
    vocabulary) lights up as a distance spike.  Everything is INTEGER:
    with per-chunk self-products ``ss_c = Σ cnt²`` and the matched
    cross product ``x_c = Σ cnt_c·cnt_{c+1}``, the distance is
    ``ss_c + ss_{c+1} − 2·x_c`` — exact on any engine.

    Returns one row per adjacent chunk pair ``(series_id, chunk,
    dist, dist_rank, flag)`` where ``chunk`` is the LATER chunk and
    ``flag`` marks the top ``top_frac`` distances per series.

    Scale shape: symbols are the tiny SAX projection (rows/seg_len);
    bigram counts and the adjacent-chunk join are per-(series, chunk,
    bigram) — ≤ α² rows per chunk — so the whole scoring DAG runs on
    broadcast-sized tables regardless of input scale.
    """
    paa = _sax_symbols(df, value_col, seg_len, alphabet)
    w = Window.partitionBy("series_id").orderBy("seg")
    bi = (
        paa.withColumn(
            "bigram", F.concat("symbol", F.lead("symbol", 1).over(w))
        )
        .filter(F.col("bigram").isNotNull())
        .withColumn("chunk", F.floor(F.col("seg") / F.lit(int(chunk_len))))
    )
    cnt = bi.groupBy("series_id", "chunk", "bigram").agg(
        F.count("*").alias("cnt")
    )
    ss = cnt.groupBy("series_id", "chunk").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    nxt = cnt.select(
        "series_id",
        (F.col("chunk") - 1).alias("chunk"),
        "bigram",
        F.col("cnt").alias("cnt_next"),
    )
    cross = (
        cnt.join(nxt, ["series_id", "chunk", "bigram"])
        .groupBy("series_id", "chunk")
        .agg(F.sum(F.col("cnt") * F.col("cnt_next")).alias("x"))
    )
    ss_next = ss.select(
        "series_id",
        (F.col("chunk") - 1).alias("chunk"),
        F.col("ss").alias("ss_next"),
    )
    pairs = (
        ss.join(ss_next, ["series_id", "chunk"])
        .join(cross, ["series_id", "chunk"], "left")
        .select(
            "series_id",
            (F.col("chunk") + 1).alias("chunk"),
            (
                F.col("ss")
                + F.col("ss_next")
                - 2 * F.coalesce(F.col("x"), F.lit(0))
            ).alias("dist"),
        )
    )
    wr = Window.partitionBy("series_id").orderBy(
        F.desc("dist"), F.asc("chunk")
    )
    n = F.count("*").over(Window.partitionBy("series_id"))
    return pairs.withColumn("dist_rank", F.rank().over(wr)).withColumn(
        "flag",
        (
            F.col("dist_rank")
            <= F.greatest(F.lit(1), F.floor(n * F.lit(float(top_frac))))
        ).cast("int"),
    )


def sax_mindist(
    df: DataFrame,
    value_col: str = "value",
    seg_len: int = 4,
    alphabet: int = 4,
    series_subset=None,
    max_pairs: int = 64,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Pairwise time-aligned SAX MINDIST (Lin et al. 2003, eq. 6):
    the lower-bounding symbolic distance between series — compares
    the two series' symbols segment by segment and accumulates the
    breakpoint-gap cell distances,

        MINDIST = sqrt(seg_len) * sqrt(Σ_seg cell(q_seg, c_seg)²)

    with ``cell(a, b) = 0`` for adjacent-or-equal symbols else the
    enclosed breakpoint gap.  The symbolic counterpart of
    ``rolling_corr``/``cross_correlation`` for the multi-channel
    similarity question, and the distance HOT-SAX-style discord
    mining builds on.

    Everything is native algebra on the shared ``_sax_symbols`` front
    half: the cell distances come from a literal (alphabet²)-row
    lookup table (broadcast; shared verbatim with the oracle, like
    the Gaussian breakpoints), one seg-keyed pair join, one decimal
    aggregate.  sqrt on bit-identical doubles is exact cross-engine —
    fully hash-gateable.

    The pair frame is |series|²-fold: the same API guard as
    ``cross_correlation`` (``series_subset`` / ``max_pairs`` /
    ``allow_all_pairs``) bounds it at scale.
    """
    from .acf import _guard_pair_explosion

    df = _guard_pair_explosion(
        df, series_subset, max_pairs, allow_all_pairs, "sax_mindist"
    )
    sym = _sax_symbols(df, value_col, seg_len, alphabet)
    bps = BREAKPOINTS[alphabet]
    rows = []
    for i in range(alphabet):
        for j in range(alphabet):
            d = 0.0 if abs(i - j) <= 1 else bps[max(i, j) - 1] - bps[min(i, j)]
            rows.append((ALPHA[i], ALPHA[j], float(d)))
    dt = df.sparkSession.createDataFrame(rows, "sa string, sb string, d double")
    a = sym.select(
        F.col("series_id").alias("series_a"), "seg", F.col("symbol").alias("sa")
    )
    b = sym.select(
        F.col("series_id").alias("series_b"), "seg", F.col("symbol").alias("sb")
    )
    j = (
        a.join(b, "seg")
        .where(F.col("series_a") < F.col("series_b"))
        .join(F.broadcast(dt), ["sa", "sb"])
    )
    agg = j.groupBy("series_a", "series_b").agg(
        F.count("*").alias("n_segs"),
        F.sum((F.col("d") * F.col("d")).cast(DEC)).cast("double").alias("__ssd"),
    )
    return agg.select(
        "series_a",
        "series_b",
        "n_segs",
        (F.sqrt(F.lit(float(seg_len))) * F.sqrt(F.col("__ssd"))).alias(
            "mindist"
        ),
    )
