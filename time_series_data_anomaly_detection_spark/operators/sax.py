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
    paa = paa.withColumn("symbol", sym)
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
