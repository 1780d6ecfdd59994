"""Run-length sessionization: flags → events, gap-merge, persistence.

Reference semantics:
- ``merge_flags_to_events`` (``src/evaluate.py:27-63``): maximal runs of
  consecutive 1-flags become inclusive ``(start_idx, end_idx)`` events;
  events whose gap satisfies ``start - prev_end <= gap + 1`` are merged
  (gap = number of zeros bridged).
- ``persist_filter`` (``src/evaluate.py:125-146``): zero out runs of 1s
  shorter than ``p``.

Spark-first shape: classic sessionization — change-point marker via
``lag``, run id via running ``sum``, run extents via ``groupBy``.  The
event tables are tiny relative to the input (one row per run), so the
second-pass gap-merge window runs on a frame thousands of times smaller
than the points table.  No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


KEYS = ("series_id",)


def _run_ids(df: DataFrame, flag_col: str, keys: tuple = KEYS) -> DataFrame:
    """Attach ``__run`` — a per-key id that increments whenever the
    flag value changes (requires ``rn`` from sources.with_row_index).

    ``keys`` generalizes the partition: the threshold sweep runs the
    SAME sessionization over (series_id, k) so all grid candidates
    resolve in one window pass instead of one scan per k.
    """
    w = Window.partitionBy(*keys).orderBy("rn")
    chg = F.when(
        F.lag(flag_col).over(w).isNull()
        | (F.col(flag_col) != F.lag(flag_col).over(w)),
        1,
    ).otherwise(0)
    return df.withColumn("__run", F.sum(chg).over(w))


def raw_runs(
    df: DataFrame,
    flag_col: str = "flag",
    idx_col: str = "rn",
    keys: tuple = KEYS,
    carry_ts: bool = False,
) -> DataFrame:
    """Maximal runs of consecutive 1-flags as ``keys, start_idx,
    end_idx`` (inclusive).  The ONLY full-data pass in the event stack —
    everything downstream (persistence, gap-merge, overlap metrics)
    operates on this frame, which is thousands of times smaller.

    ``carry_ts`` also aggregates ``min(timestamp)`` per run (free — the
    pass already scans the points), so latency-style consumers never
    need to join back to the points frame for the event-start
    timestamp (at scale that join-back is a second full scan+shuffle).
    """
    aggs = [F.min(idx_col).alias("start_idx"), F.max(idx_col).alias("end_idx")]
    if carry_ts:
        aggs.append(F.min("timestamp").alias("start_ts"))
    return (
        _run_ids(df, flag_col, keys)
        .filter(F.col(flag_col) == 1)
        .groupBy(*keys, "__run")
        .agg(*aggs)
    )


def merge_runs(runs: DataFrame, gap: int = 0, keys: tuple = KEYS) -> DataFrame:
    """Gap-merge disjoint sorted runs and number them by start order.

    Gap-merge condition is the reference's exact off-by-one:
    ``start - prev_end <= gap + 1`` (``src/evaluate.py:57``).  Chained
    merges collapse correctly because raw runs are disjoint and sorted,
    so the running ``sum`` of break markers assigns one group per
    merged chain.
    """
    has_ts = "start_ts" in runs.columns
    we = Window.partitionBy(*keys).orderBy("start_idx")
    if gap > 0:
        brk = F.when(
            F.lag("end_idx").over(we).isNull()
            | (F.col("start_idx") - F.lag("end_idx").over(we) > gap + 1),
            1,
        ).otherwise(0)
        aggs = [
            F.min("start_idx").alias("start_idx"),
            F.max("end_idx").alias("end_idx"),
        ]
        if has_ts:
            # timestamps are monotone in rn per series, so the merged
            # event's start timestamp is the min over merged runs
            aggs.append(F.min("start_ts").alias("start_ts"))
        runs = (
            runs.withColumn("__evt", F.sum(brk).over(we))
            .groupBy(*keys, "__evt")
            .agg(*aggs)
        )
    return runs.select(
        *keys,
        F.row_number()
        .over(Window.partitionBy(*keys).orderBy("start_idx"))
        .alias("event_id"),
        "start_idx",
        "end_idx",
        *(["start_ts"] if has_ts else []),
    )


def flags_to_events(
    df: DataFrame,
    flag_col: str = "flag",
    gap: int = 0,
    idx_col: str = "rn",
    keys: tuple = KEYS,
    carry_ts: bool = False,
) -> DataFrame:
    """W5: RLE flags into an event table, then gap-merge.

    Returns ``series_id, event_id, start_idx, end_idx`` (inclusive,
    1-based when idx_col='rn'), event_id numbered by start order;
    plus ``start_ts`` when ``carry_ts``.
    """
    return merge_runs(raw_runs(df, flag_col, idx_col, keys, carry_ts), gap, keys)


def persistence_filter(
    df: DataFrame,
    flag_col: str = "flag",
    p: int = 2,
    out_col: str | None = None,
    keys: tuple = KEYS,
) -> DataFrame:
    """W6: zero out 1-runs shorter than ``p`` consecutive samples.

    Reference ``persist_filter`` (``src/evaluate.py:125-146``).
    Implemented without a join: run id via cumulative change marker,
    run length via a count window over (series, run).
    """
    out_col = out_col or flag_col
    if p <= 1:
        return df.withColumn(out_col, F.col(flag_col)) if out_col != flag_col else df
    marked = _run_ids(df, flag_col, keys)
    run_len = F.count("*").over(Window.partitionBy(*keys, "__run"))
    return marked.withColumn(
        out_col,
        F.when((F.col(flag_col) == 1) & (run_len < p), 0).otherwise(F.col(flag_col)),
    ).drop("__run")
