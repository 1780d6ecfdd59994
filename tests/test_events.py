"""Run-length semantics: the reference's exact gap-merge and persistence
boundaries (src/evaluate.py:27-63, :125-146)."""

import pytest

from conftest import flags_df
from time_series_data_anomaly_detection_spark.operators import (
    flags_to_events,
    persistence_filter,
)


def events_list(df):
    return [
        (r.start_idx, r.end_idx)
        for r in df.orderBy("series_id", "start_idx").collect()
    ]


def test_simple_runs(spark):
    # flags at 0-based idx 1-2 and 5; rn is 1-based
    df = flags_df(spark, [0, 1, 1, 0, 0, 1, 0])
    assert events_list(flags_to_events(df, "flag", gap=0)) == [(2, 3), (6, 6)]


@pytest.mark.parametrize(
    "flags,gap,expected",
    [
        # gap=1 bridges exactly one zero: 1 0 1 -> one event (ref comment :56)
        ([1, 0, 1], 1, [(1, 3)]),
        # two zeros apart, gap=1: start-prev_end = 3-1... 0-based (0,0),(3,3):
        # 3-0=3 > gap+1=2 -> no merge
        ([1, 0, 0, 1], 1, [(1, 1), (4, 4)]),
        ([1, 0, 0, 1], 2, [(1, 4)]),
        # chained merging: three singletons each 1 zero apart, gap=1
        ([1, 0, 1, 0, 1], 1, [(1, 5)]),
        ([1, 1, 1], 0, [(1, 3)]),
        ([0, 0, 0], 3, []),
        # events at both ends
        ([1, 0, 0, 0, 1], 3, [(1, 5)]),
    ],
)
def test_gap_merge_boundaries(spark, flags, gap, expected):
    df = flags_df(spark, flags)
    assert events_list(flags_to_events(df, "flag", gap=gap)) == expected


@pytest.mark.parametrize(
    "flags,p,expected",
    [
        # run of p-1 removed, run of p kept (ref :141 strict <)
        ([1, 0, 1, 1, 0], 2, [0, 0, 1, 1, 0]),
        ([1, 1, 0, 1, 1, 1], 3, [0, 0, 0, 1, 1, 1]),
        ([1, 1, 1], 1, [1, 1, 1]),
        ([1], 2, [0]),
    ],
)
def test_persistence_boundaries(spark, flags, p, expected):
    df = persistence_filter(flags_df(spark, flags), "flag", p=p)
    got = [r.flag for r in df.orderBy("rn").collect()]
    assert got == expected


def test_multi_series_isolation(spark):
    a = flags_df(spark, [1, 1, 0], "a")
    b = flags_df(spark, [0, 1, 1], "b")
    ev = flags_to_events(a.unionByName(b), "flag", gap=0)
    got = {(r.series_id, r.start_idx, r.end_idx) for r in ev.collect()}
    assert got == {("a", 1, 2), ("b", 2, 3)}


def test_session_funnel_order_matters(spark):
    """The funnel requires chronological order: a purchase BEFORE the
    click in the same session must not count as step 3."""
    import pandas as pd

    from time_series_data_anomaly_detection_spark.datapipe.events import (
        session_funnel,
    )

    rows = []
    # user 1, one session: view -> click -> purchase (full conversion)
    for i, (t, ty) in enumerate([(0, "view"), (60, "click"), (120, "purchase")]):
        rows.append((i, 1, ty, 1_700_000_000 + t, 1.0, "{}"))
    # user 2, one session: purchase -> view -> click (purchase too early)
    for i, (t, ty) in enumerate([(0, "purchase"), (60, "view"), (120, "click")]):
        rows.append((10 + i, 2, ty, 1_700_000_000 + t, 1.0, "{}"))
    # user 3: view only
    rows.append((20, 3, "view", 1_700_000_000, 1.0, "{}"))
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["event_id", "user_id", "event_type", "ts_s", "value", "props"],
        )
    )
    out = {r.step: r for r in session_funnel(df).collect()}
    assert out["view"].n_sessions == 3
    assert out["click"].n_sessions == 2     # users 1 and 2 (click after view)
    assert out["purchase"].n_sessions == 1  # only user 1 in order
    assert out["purchase"].conversion == pytest.approx(1 / 3, abs=1e-6)
