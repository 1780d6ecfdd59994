"""Text-derived document embeddings via the hashing trick, kept
SPARSE end to end.

``tf_embed_sparse`` maps each token to ``hash48(token) % dim`` and
accumulates term counts — the classic feature-hashing bag-of-words
embedding (Weinberger et al. 2009; Spark ML's ``HashingTF`` is the
same idea).  Everything downstream stays in the sparse
(doc, dim_idx, cnt) representation:

- cosine(a, b) = Σ_shared-dims cnt_a·cnt_b / (‖a‖·‖b‖) — an
  equi-join on ``dim_idx`` + a sum, never a dense array op;
- the accumulating sums are INTEGER (exact, partition-order
  independent) and the float division/sqrt happen once per output
  row on those exact integers — so the value is bit-identical across
  engines despite the unordered grouped sum (a float-weight dot
  product would drift in the last ulp between Spark's and DuckDB's
  addition orders);
- the query side is tiny by definition and broadcasts, so the corpus
  is scanned once and never self-joined;
- at 100 TB the join key is an int in [0, dim) — the skew axis is a
  hot dimension (stopword hash), bounded by dropping top-df dims or
  salting, exactly like the shingle posting lists in dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hash48, tokenize


def tf_embed_sparse(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse hashed-TF embedding: (id, dim_idx, cnt, weight) with
    integer term counts and the L2-normalized float weight.  One
    explode + one groupBy; downstream exact math uses ``cnt``,
    consumers wanting a unit vector read ``weight``."""
    toks = tokenize(df, text_col).select(
        F.col(id_col), F.explode("tokens").alias("__tok")
    )
    counts = (
        toks.select(
            id_col, (hash48(F.col("__tok")) % F.lit(dim)).alias("dim_idx")
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(id_col)
    nrm = F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).over(w))
    return counts.select(
        id_col, "dim_idx", "cnt", (F.col("cnt") / nrm).alias("weight")
    )


def doc_cosine_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cosine top-k of the first ``n_queries`` docs against the
    corpus over the sparse embedding: equi-join on dim_idx (query side
    broadcast), integer dot product, one float division per pair.

    Docs sharing no hashed dimension never pair up (they'd score 0
    anyway) — sparse semantics keep the candidate set bounded by
    dimension co-occurrence.
    """
    from ..session import tracked_cache

    # three consumers (norm aggregate, broadcast query side, main dots
    # scan) — cache so the tokenize+explode+groupBy lineage runs once
    emb = tracked_cache(tf_embed_sparse(df, dim, text_col, id_col))
    sq = emb.groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("__sq")
    )
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        "dim_idx",
        F.col("cnt").alias("qc"),
    )
    dots = (
        emb.select(F.col(id_col).alias("match_id"), "dim_idx", "cnt")
        .join(F.broadcast(q), "dim_idx")
        .filter(F.col("match_id") != F.col("query_id"))
        .groupBy("query_id", "match_id")
        .agg(F.sum(F.col("qc") * F.col("cnt")).alias("__dot"))
    )
    qs = sq.select(F.col(id_col).alias("query_id"), F.col("__sq").alias("__qs"))
    ms = sq.select(F.col(id_col).alias("match_id"), F.col("__sq").alias("__ms"))
    scored = (
        dots.join(F.broadcast(qs), "query_id")
        .join(ms, "match_id")
        .select(
            "query_id",
            "match_id",
            (
                F.col("__dot")
                / (F.sqrt(F.col("__qs")) * F.sqrt(F.col("__ms")))
            ).alias("cosine"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
