"""Ingest-time corpus quality monitoring — the streaming sibling of
``datapipe.corpus.corpus_drift``: instead of comparing two materialized
snapshots after the fact, watch the per-source quality mix move window
by window AS the documents arrive.

Everything row-wise (token stats, quality score, PII hits) is a
STATELESS projection lifted straight from the batch operators
(``datapipe.text.doc_stats``, ``datapipe.decontam`` patterns), so the
only streaming state is the windowed aggregate itself —
watermark-bounded, evicted for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datapipe.decontam import EMAIL_RE, IPV4_RE, SSN_RE
from ..datapipe.text import doc_stats


def streaming_source_quality(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Per-(source, event-time window) quality report over the document
    ingest stream: doc count, token volume, mean quality, and the
    fraction of docs carrying any PII-shaped span.

    A window whose ``mean_quality`` or ``pii_rate`` jumps against the
    trailing baseline is the ingest-time drift alarm; the batch
    ``corpus_drift`` query is the deep-dive that follows.
    """
    txt = F.col(text_col)

    def n_matches(pat):
        return F.size(F.regexp_extract_all(txt, F.lit(pat), 0))

    pii_n = n_matches(EMAIL_RE) + n_matches(IPV4_RE) + n_matches(SSN_RE)
    s = doc_stats(stream, text_col).withColumn(
        "__pii", (pii_n > 0).cast("int")
    )
    return (
        s.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.col(strata_col),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("quality_score").alias("mean_quality"),
            F.avg("__pii").alias("pii_rate"),
        )
        .select(
            strata_col,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_docs",
            "total_tokens",
            "mean_quality",
            "pii_rate",
        )
    )


def streaming_sessions(
    stream,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Streaming sessionization with Spark's NATIVE session windows —
    the streaming twin of ``datapipe.events.user_sessions`` (which
    builds gap-sessions with a lag/cumsum window in batch).

    ``F.session_window`` keeps per-user open-session state in the
    state store, extends it while events arrive within ``gap``, and
    EMITS the closed session once the watermark passes its end — the
    engine-managed version of exactly the state machine the batch
    operator replays, with eviction for free.

    Returns one row per CLOSED session: ``user_id, session_start,
    session_end, n_events, n_event_types, total_value``.

    Scale shape: state is keyed by (user, open session) — the same
    axis the batch operator groups on; a 100M-user stream spreads by
    key with no hand-scheduling, and the watermark bounds state.
    """
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("event_type").alias("n_event_types"),
            F.sum("value").alias("total_value"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "n_event_types",
            "total_value",
        )
    )
