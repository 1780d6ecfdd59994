"""Generic as-of join (SURVEY §2.5 J1's general form).

``asof_join(left, right)``: every left row picks the LATEST right row
whose ordering key is ≤ the left row's, per join key — the canonical
time-series enrichment join (trades/quotes, config-at-time,
time-since-last-event).

Spark-first implementation — the union + forward-fill pattern, NOT a
range join:

1. Tag both inputs and union them on (key, order, side).
2. One window per key ordered by (order, side-priority) computes
   ``last(right-payload, ignorenulls=True)`` — each left row sees the
   most recent right payload at or before its position.
3. Filter back to left rows.

Why this shape at 100 TB: a range-condition join
(``l.t >= r.t``) is a cartesian-per-key explosion the optimizer can't
prune when the right side is large; the union form is ONE shuffle of
left+right on the join key and a single window sort — the same
exchange the downstream per-key operators need anyway.  A broadcast
range join only wins when the right side is tiny; the union form wins
everywhere else and ties there.

Right-side ties (several right rows at the same order value) resolve
to the LAST one in (order, tie_col) order — deterministic; pass
``tie_col`` when the right side can carry duplicates.

The DuckDB oracle uses the native ``ASOF LEFT JOIN`` — an
implementation so different that agreement is strong evidence of
correct semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "rn",
    by: str | list[str] = "series_id",
    payload: list[str] | None = None,
    suffix: str = "_asof",
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with ``right.on <=
    left.on`` within the ``by`` group.  Right columns (``payload``,
    default all non-key/non-order) come back suffixed; left rows with
    no earlier right row get nulls."""
    keys = [by] if isinstance(by, str) else list(by)
    if payload is None:
        payload = [c for c in right.columns if c not in keys + [on]]

    # Explicit output-name bookkeeping: the projection below must not
    # key off the suffix STRING (a left column legitimately named
    # e.g. 'price_asof' would be silently dropped), and a left column
    # colliding with a generated payload name would corrupt the
    # union construction — fail loudly instead.
    out_names = {f"{c}{suffix}" for c in payload}
    collisions = out_names & set(left.columns)
    if collisions:
        raise ValueError(
            f"asof_join: left column(s) {sorted(collisions)} collide with "
            f"suffixed right payload names; pass a different suffix= or "
            f"rename the left column(s)"
        )

    lt = left.withColumn("__side", F.lit(1))
    for c in payload:
        pc = f"{c}{suffix}"
        lt = lt.withColumn(pc, F.lit(None).cast(right.schema[c].dataType))
    rt_cols = [F.col(k) for k in keys] + [F.col(on)] + [
        F.col(c).alias(f"{c}{suffix}") for c in payload
    ]
    rt = right.select(*rt_cols).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in keys + [on]:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*lt.columns)

    both = lt.unionByName(rt)
    # right rows (side 0) sort BEFORE left rows at the same `on` value,
    # so an exactly-simultaneous right row IS visible to the left row
    order = [F.col(on), F.col("__side")]
    if tie_col is not None:
        order.append(
            F.when(F.col("__side") == 0, F.col(f"{tie_col}{suffix}")).asc_nulls_first()
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *[c for c in both.columns if c not in out_names and c != "__side"],
        F.col("__side"),
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
