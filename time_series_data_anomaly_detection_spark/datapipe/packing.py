"""Sequence packing: concat-and-chunk documents into fixed-size
context windows — the step between "curated corpus" and "training
batches".

The packing rule is the one production pretraining pipelines use:
documents are laid end-to-end in a deterministic order and the token
stream is cut every ``ctx`` tokens, so every chunk is exactly full
(the last one per shard may be partial) and a document can straddle a
chunk boundary.  This is pure column algebra:

- one window pass per shard gives each doc its running start offset;
- the chunks a doc touches are ``floor(start/ctx) ..
  floor((end-1)/ctx)`` — a ``sequence`` + ``explode`` whose length is
  ``ceil(doc_tokens/ctx)``, i.e. output rows ≈ docs + chunk
  crossings, NOT docs × chunks;
- per-chunk token contribution is an overlap min/max — no UDF.

Scale shape: the window partitions by ``shard_col`` (e.g. source, or
a hash-bucket column), so packing is embarrassingly parallel across
shards and no global sort exists.  Chunk ids are per-shard;
(shard, chunk_id) is the global key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_RE, hash48, tokenize


def pack_documents(
    df: DataFrame,
    ctx: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its (shard, chunk) spans under
    concat-and-chunk packing with per-shard doc-id order.

    Output: one row per (shard, chunk_id, doc) the doc touches, with
    ``tok_in_chunk`` (the doc's token count inside that chunk) and the
    doc's global [start, end) token offsets within its shard.
    Zero-token documents contribute nothing to any chunk and are
    dropped (they would otherwise occupy a zero-width span).
    """
    n_tok = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    return pack_documents_from_counts(
        df.select(F.col(shard_col), F.col(id_col), n_tok.alias("n_tok")),
        ctx=ctx,
        shard_col=shard_col,
        id_col=id_col,
        count_col="n_tok",
    )


def pack_documents_from_counts(
    df: DataFrame,
    ctx: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    count_col: str = "n_tok",
) -> DataFrame:
    """Concat-and-chunk spans over a PRECOMPUTED per-doc token count
    (e.g. exact learned-BPE counts from
    ``tokenize_bpe.bpe_encode_stats``) instead of the regex word
    count — the token-exact packing a real training pipeline needs:
    chunk boundaries land on TOKENIZER tokens, so every context
    window holds exactly ``ctx`` model tokens."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        df.select(
            F.col(shard_col), F.col(id_col), F.col(count_col).alias("n_tok")
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("end_off", F.sum("n_tok").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("n_tok"))
    )
    chunk = F.explode(
        F.sequence(
            F.floor(F.col("start_off") / ctx),
            F.floor((F.col("end_off") - 1) / ctx),
        )
    ).alias("chunk_id")
    e = d.select(shard_col, id_col, "n_tok", "start_off", "end_off", chunk)
    tok_in = F.least(
        F.col("end_off"), (F.col("chunk_id") + 1) * ctx
    ) - F.greatest(F.col("start_off"), F.col("chunk_id") * ctx)
    return e.withColumn("tok_in_chunk", tok_in.cast("long"))


def pack_stats(
    df: DataFrame,
    ctx: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-chunk packing summary: docs touching the chunk, tokens
    filled, fill ratio, and the first/last doc ids — the frame a
    training-data loader needs to materialize batches, and the QA
    check that packing wastes no budget (every chunk but the shard
    tail has fill_ratio 1)."""
    packed = pack_documents(df, ctx, shard_col, id_col, text_col)
    return _chunk_stats(packed, ctx, shard_col, id_col)


def pack_stats_from_counts(
    df: DataFrame,
    ctx: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    count_col: str = "n_tok",
) -> DataFrame:
    """:func:`pack_stats` over a precomputed token-count column — the
    chunk summary for token-exact (BPE) packing."""
    packed = pack_documents_from_counts(df, ctx, shard_col, id_col, count_col)
    return _chunk_stats(packed, ctx, shard_col, id_col)


def _chunk_stats(
    packed: DataFrame, ctx: int, shard_col: str, id_col: str
) -> DataFrame:
    return packed.groupBy(shard_col, "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok_in_chunk").alias("n_tokens"),
        F.round(F.sum("tok_in_chunk") / F.lit(float(ctx)), 6).alias(
            "fill_ratio"
        ),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_epochs: int = 1,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "ord",
) -> None:
    """Materialize the deterministic training order
    (:func:`datapipe.sampling.training_order`) as the SHARDED PARQUET
    LAYOUT a data loader actually reads: one directory per
    (epoch, shard), rows inside each file sorted by ``pos``.

    Write shape: ``repartition(epoch, shard)`` makes each output shard
    the work of exactly one task (so each directory holds one file),
    and ``sortWithinPartitions`` makes FILE order the READ order — a
    loader streams shard files sequentially with zero further
    shuffling, and a re-run (or a backfill of one shard) is
    byte-identical because order comes from the content hash, not from
    task scheduling.  Scale ``n_shards`` with the cluster: one shard ≈
    one loader stream ≈ one write task.
    """
    from .sampling import training_order

    order = training_order(
        df, n_epochs=n_epochs, n_shards=n_shards, id_col=id_col, salt=salt
    )
    (
        df.join(order, id_col)
        .repartition(F.col("epoch"), F.col("shard"))
        .sortWithinPartitions("epoch", "shard", "pos")
        .write.mode("overwrite")
        .partitionBy("epoch", "shard")
        .parquet(path)
    )


def pack_bins_ffd(
    df: DataFrame,
    ctx: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NO-SPLIT bin packing: first-fit-decreasing within each shard —
    the packing mode for objectives that cannot tolerate a document
    straddling a context boundary (contrast :func:`pack_documents`,
    which concat-and-chunks and splits freely).

    Deterministic: docs are processed by (token count DESC, id ASC);
    each goes into the FIRST bin (by creation order) with room, else
    opens a new bin.  Docs longer than ``ctx`` get a single oversized
    bin of their own, flagged ``oversize = 1`` (truncate-or-split is
    the caller's policy decision).  FFD is inherently sequential —
    this is one of the few operators where a grouped-map
    (``applyInPandas``) is the honest implementation; the grouping
    axis is the shard, so parallelism is shard count (at 100 TB shard
    by hash-bucket, thousands of groups), and per-group state is the
    bin fill table, O(bins).

    Output: (shard, doc_id, n_tok, bin_id, oversize) with bin_id
    numbered per shard in creation order.
    """
    import pandas as pd

    toks = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    slim = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        toks.alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # bin_id -> tokens used (oversize: > ctx)
        bin_ids: list[int] = []
        oversize: list[int] = []
        for n in pdf["n_tok"]:
            n = int(n)
            if n > ctx:  # own flagged bin; never receives other docs
                fills.append(n)
                bin_ids.append(len(fills) - 1)
                oversize.append(1)
                continue
            for b, used in enumerate(fills):
                if used + n <= ctx:  # oversize bins auto-fail this test
                    fills[b] = used + n
                    bin_ids.append(b)
                    break
            else:
                fills.append(n)
                bin_ids.append(len(fills) - 1)
            oversize.append(0)
        pdf["bin_id"] = bin_ids
        pdf["oversize"] = oversize
        return pdf

    out_schema = "shard string, " + f"{id_col} long, n_tok int, " \
        "bin_id long, oversize int"
    return slim.groupBy("shard").applyInPandas(pack, out_schema)


def chunk_documents(
    df: DataFrame,
    ctx: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    long-document path next to :func:`pack_documents` (which packs
    SHORT docs together): a doc longer than ``ctx`` tokens becomes
    ceil((n - overlap) / (ctx - overlap)) chunks, consecutive chunks
    sharing ``overlap`` tokens so no span is ever cut without context
    (the standard RAG / long-doc pretraining shape).

    Output: (doc_id, chunk_id, start_tok, end_tok, n_tok_in_chunk,
    chunk_hash) — 1-based inclusive token offsets; ``chunk_hash`` is
    the portable 48-bit hash of the chunk's reassembled token span, so
    the exact chunk CONTENT is gate-checkable without shipping it.

    Pure column algebra: tokenize → sequence+explode of chunk indices
    (output rows = chunks, not tokens) → slice for the span — a single
    map-side pass after the doc-repartition, no window, no UDF.
    """
    stride = ctx - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than ctx")
    t = tokenize(df.repartition(F.col(id_col)), text_col)
    n = F.size("tokens")
    n_chunks = F.when(n <= ctx, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    d = t.select(
        id_col,
        "tokens",
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * stride + 1).cast("long")
    end = F.least(start + ctx - 1, F.col("__n").cast("long"))
    span = F.slice("tokens", start, (end - start + 1).cast("int"))
    return d.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_tok"),
        end.alias("end_tok"),
        (end - start + 1).alias("n_tok_in_chunk"),
        hash48(F.concat_ws(" ", span)).alias("chunk_hash"),
    )


LENGTH_BUCKET_CAPS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def length_buckets(
    df: DataFrame,
    caps: tuple[int, ...] = LENGTH_BUCKET_CAPS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching plan: assign each doc the smallest
    bucket cap that holds its token count, then report per-bucket
    volume and PADDING WASTE (1 - real/padded tokens) — the number
    that decides whether fixed-shape batches are affordable or the
    packer (``pack_chunks``/``pack_bins_ffd``) has to run.

    Docs longer than the largest cap land in bucket -1 (route to
    chunking).  Pure projection + one small aggregate: the bucket
    CASE ladder is integer comparisons against literals, so the scan
    stays map-side and the shuffle carries |caps|+1 rows per
    partition.  Waste ratios divide exact integer sums — bit-stable
    by construction.
    """
    n = F.size("tokens")
    bucket = F.lit(-1)
    for cap in reversed(caps):
        bucket = F.when(n <= F.lit(cap), F.lit(cap)).otherwise(bucket)
    t = tokenize(df, text_col).select(
        F.col(id_col), n.alias("n_tokens"), bucket.alias("bucket")
    )
    agg = t.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    padded = F.when(
        F.col("bucket") > 0, F.col("n_docs") * F.col("bucket")
    ).cast("long")
    return agg.select(
        "bucket",
        "n_docs",
        "sum_tokens",
        padded.alias("padded_tokens"),
        F.when(
            F.col("bucket") > 0,
            F.lit(1.0) - F.col("sum_tokens") / (F.col("n_docs") * F.col("bucket")),
        ).alias("waste_ratio"),
    )
