"""Streaming exact deduplication — the ingest-time twin of
``datapipe.dedup.exact_dedup``.

A training-data ingest pipeline dedups AT ARRIVAL, not in a nightly
batch: the stream keeps the first-seen document per content digest and
drops every later copy while its digest is still inside the watermark
horizon.  Built entirely on Spark's native
``dropDuplicatesWithinWatermark`` so state eviction is
watermark-driven: memory is O(unique digests per horizon), not
O(corpus) — the property that lets the same query run forever.

The digest is the SAME normalization + md5 as the batch operator
(lower, trim, whitespace-collapse), so a stream survivor set and a
batch ``exact_dedup(keep=1)`` set agree group-for-group; only the
choice of survivor inside a group differs (stream: first seen; batch:
smallest id — pinned by the parity test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen document per normalized-content digest.

    Output = input rows that survive, plus their ``dup_group`` digest.
    A duplicate arriving later than ``watermark`` after its twin is NOT
    suppressed (its state was evicted) — the standard streaming-dedup
    contract; size the watermark to the re-post horizon that matters.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        stream.withColumn("dup_group", F.md5(norm))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["dup_group"])
    )
