"""Persisted dedup index: scan the lake ONCE, dedup every future
ingest batch against the stored index.

``incremental_dedup(corpus, batch)`` re-derives the corpus-side
frames per call — right for tests, wrong for a 100 TB lake.  This
module materializes those exact frames (content digests, LSH band
keys, shingle hashes, shingle counts) as parquet once, so each daily
batch pays only: one scan of the index digest table, one band-table
equi-join against the batch's broadcast band keys, and shingle
verification for the candidates.  Append-only maintenance: admitted
docs' index rows are appended (``extend_dedup_index``) — no rebuild.

Layout (all plain parquet, co-partitioned by their join keys at
write so large-lake reads start hash-distributed):

    {path}/digests/   dup_group                 (distinct)
    {path}/bands/     doc_id, band, band_key
    {path}/shingles/  doc_id, shingle_hash
    {path}/sizes/     doc_id, n_sh
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dedup import _incremental_core, corpus_index_frames
from ._skew import DEFAULT_BUCKET_CAP

_PARTS = ("digests", "bands", "shingles", "sizes")


def _keys(id_col: str) -> dict:
    return {
        "digests": ["dup_group"],
        "bands": ["band", "band_key"],
        "shingles": [id_col],
        "sizes": [id_col],
    }


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One corpus scan → the four index tables, repartitioned on
    their downstream join keys."""
    frames = corpus_index_frames(corpus, n, text_col, id_col)
    keys = _keys(id_col)
    for name in _PARTS:
        df = frames[name]
        df.repartition(*keys[name]).write.mode("overwrite").parquet(
            f"{path}/{name}"
        )


def extend_dedup_index(
    admitted: DataFrame,
    path: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append the ADMITTED docs of a batch (verdict 'new') to the
    index — the post-ingest maintenance step.  Append-only parquet;
    digest distinctness is restored lazily at read (a duplicate
    digest row changes no verdict)."""
    frames = corpus_index_frames(admitted, n, text_col, id_col)
    keys = _keys(id_col)
    for name in _PARTS:
        frames[name].repartition(*keys[name]).write.mode("append").parquet(
            f"{path}/{name}"
        )


def load_dedup_index(spark: SparkSession, path: str) -> dict:
    idx = {name: spark.read.parquet(f"{path}/{name}") for name in _PARTS}
    # append-only maintenance can introduce duplicate digest rows
    idx["digests"] = idx["digests"].distinct()
    return idx


def incremental_dedup_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """The daily ingest query: batch vs the persisted index — same
    verdict ladder and values as ``incremental_dedup`` against the
    live corpus (pinned by the round-trip test), without touching the
    corpus itself."""
    idx = load_dedup_index(spark, path)
    return _incremental_core(
        idx, batch, n, threshold, text_col, id_col, bucket_cap
    )
