"""Property-based tests (hypothesis): the fiddly sequential semantics
— RLE + gap-merge, persistence, rolling min_periods + bfill, label
windows — checked against independent pandas implementations of the
reference behavior (SURVEY §5 'fiddly semantics' list) on random
inputs."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import flags_df, series_df

from time_series_data_anomaly_detection_spark.operators.events import (
    flags_to_events,
    persistence_filter,
)
from time_series_data_anomaly_detection_spark.operators.labeling import (
    mark_anomaly_windows,
)
from time_series_data_anomaly_detection_spark.operators.rolling import (
    rolling_stats,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def ref_events(flags, gap):
    """Reference RLE + gap-merge (semantics of src/evaluate.py:27-63):
    maximal runs of 1s -> inclusive (start, end); merge when
    start - prev_end <= gap + 1."""
    runs = []
    start = None
    for i, f in enumerate(flags):
        if f == 1 and start is None:
            start = i
        elif f == 0 and start is not None:
            runs.append((start, i - 1))
            start = None
    if start is not None:
        runs.append((start, len(flags) - 1))
    if gap <= 0 or not runs:
        return runs
    merged = [list(runs[0])]
    for s, e in runs[1:]:
        if s - merged[-1][1] <= gap + 1:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    return [tuple(r) for r in merged]


def ref_persist(flags, p):
    """Reference persistence (src/evaluate.py:125-146): zero runs < p."""
    out = list(flags)
    for s, e in ref_events(flags, 0):
        if e - s + 1 < p:
            for i in range(s, e + 1):
                out[i] = 0
    return out


@given(
    flags=st.lists(st.integers(0, 1), min_size=1, max_size=60),
    gap=st.integers(0, 4),
)
@SETTINGS
def test_flags_to_events_matches_reference(spark, flags, gap):
    got = [
        (r.start_idx - 1, r.end_idx - 1)  # rn is 1-based
        for r in flags_to_events(flags_df(spark, flags), gap=gap)
        .orderBy("start_idx")
        .collect()
    ]
    assert got == ref_events(flags, gap)


@given(
    flags=st.lists(st.integers(0, 1), min_size=1, max_size=60),
    p=st.integers(1, 5),
)
@SETTINGS
def test_persistence_matches_reference(spark, flags, p):
    got = [
        r.flag
        for r in persistence_filter(flags_df(spark, flags), p=p)
        .orderBy("rn")
        .collect()
    ]
    assert got == ref_persist(flags, p)


@given(
    values=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=80,
    ),
    window=st.integers(2, 10),
    min_periods=st.integers(1, 6),
)
@SETTINGS
def test_rolling_matches_pandas(spark, values, window, min_periods):
    # pandas raises for min_periods > window; semantics undefined
    min_periods = min(min_periods, window)
    got = (
        rolling_stats(
            series_df(spark, values), window=window, min_periods=min_periods
        )
        .orderBy("rn")
        .toPandas()
    )
    s = pd.Series([float(v) for v in values])
    exp_mean = s.rolling(window, min_periods=min_periods).mean().bfill()
    exp_std = s.rolling(window, min_periods=min_periods).std().bfill()
    # atol 1e-6: Spark and pandas use different stddev accumulation
    # orders; near-zero variance windows cancel differently (~1e-8)
    np.testing.assert_allclose(
        got["roll_mean"].to_numpy(float), exp_mean.to_numpy(float),
        atol=1e-6, equal_nan=True,
    )
    # std atol 1e-5: on a near-constant window that FOLLOWS large
    # values, pandas' moving-window variance update keeps a
    # cancellation residue of ~Σx²·eps ≈ 1e-12 in variance (≈1e-6 as
    # a std) — hypothesis found [1, 100, 0, 0, 1.2e-38] where pandas
    # reports std 1.17e-6 for the [0, 0, 1.2e-38] window while the
    # engine's exact decimal sums give the true 0.0.  The engine is
    # the accurate side here; the tolerance absorbs pandas' residue.
    np.testing.assert_allclose(
        got["roll_std"].to_numpy(float), exp_std.to_numpy(float),
        atol=1e-5, equal_nan=True,
    )


@given(
    n=st.integers(10, 60),
    anchors=st.lists(st.integers(0, 59), min_size=1, max_size=4),
    w=st.integers(0, 5),
)
@SETTINGS
def test_label_windows_match_reference(spark, n, anchors, w):
    anchors = sorted({a for a in anchors if a < n})
    if not anchors:
        anchors = [0]
    base = pd.date_range("2024-01-01", periods=n, freq="30min")
    s = series_df(spark, np.arange(n, dtype=float))
    labels = spark.createDataFrame(
        pd.DataFrame(
            {"series_id": "s1", "label_ts": [base[a] for a in anchors]}
        )
    )
    got = (
        mark_anomaly_windows(s, labels, w).orderBy("rn").toPandas()["is_anomaly"]
    )
    # reference: searchsorted anchor, mark [idx-w, idx+w] clamped
    # (src/load_nab.py:46-61)
    exp = np.zeros(n, dtype=int)
    for a in anchors:
        exp[max(a - w, 0) : min(a + w, n - 1) + 1] = 1
    assert list(got) == list(exp)


@SETTINGS
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=3,
        max_size=60,
    ),
    st.floats(min_value=0.01, max_value=5.0),
    st.floats(min_value=0.1, max_value=10.0),
)
def test_kalman_fixed_matches_reference_recursion(spark, ys, q, r):
    """Property: the Spark fixed-(q,r) filter equals a direct Python
    evaluation of the recursion for arbitrary data and (q, r)."""
    from time_series_data_anomaly_detection_spark.functions.kalman import (
        kalman_fixed,
    )

    out = (
        kalman_fixed(series_df(spark, ys), q=q, r=r)
        .orderBy("rn")
        .toPandas()
    )
    m, p = float(ys[0]), 10.0
    exp = []
    for t in range(len(ys)):
        pp = p + q
        exp.append(m)
        k = pp / (pp + r)
        m = m + k * (ys[t] - m)
        p = (1.0 - k) * pp
    np.testing.assert_allclose(
        out.pred_mean.to_numpy(), np.array(exp), rtol=0, atol=0
    )


@SETTINGS
@given(st.integers(min_value=0, max_value=2**31))
def test_winnowing_guarantee_random_docs(spark, seed):
    """Property (Schleimer et al.): two docs sharing a substring longer
    than window + k - 1 chars always share >= 1 selected fingerprint."""
    from time_series_data_anomaly_detection_spark.datapipe.text import (
        winnow_fingerprints,
    )

    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefgh "))
    def rand_text(n):
        return "".join(rng.choice(alpha, n))

    k, w = 5, 8
    shared = rand_text(k + w + 10)  # longer than w + k - 1
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    rand_text(30) + shared + rand_text(30),
                    rand_text(25) + shared + rand_text(35),
                ],
            }
        )
    )
    fp = winnow_fingerprints(docs, k=k, window=w).toPandas()
    s1 = set(fp[fp.doc_id == 1].fp_hash)
    s2 = set(fp[fp.doc_id == 2].fp_hash)
    assert s1 & s2


@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=30),
    ctx=st.integers(4, 64),
)
@SETTINGS
def test_packing_conserves_tokens(spark, toks, ctx):
    """Packing invariants on random doc lengths: per-doc contributions
    sum to the doc's token count, chunk fills never exceed ctx, and
    total chunk tokens equal total corpus tokens (nothing dropped,
    nothing double-counted)."""
    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        pack_documents,
        pack_stats,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(toks)),
            "source": "s",
            "text": [" ".join(["w"] * t) for t in toks],
        }
    )
    df = spark.createDataFrame(pdf)
    packed = pack_documents(df, ctx=ctx).toPandas()
    per_doc = packed.groupby("doc_id")["tok_in_chunk"].sum()
    assert per_doc.to_dict() == {i: t for i, t in enumerate(toks)}
    stats = pack_stats(df, ctx=ctx).toPandas()
    assert (stats["n_tokens"] <= ctx).all()
    assert stats["n_tokens"].sum() == sum(toks)
    # every chunk except the single shard tail is exactly full
    assert (stats["n_tokens"] == ctx).sum() >= len(stats) - 1


@given(frac=st.floats(0.0, 1.0), n=st.integers(50, 300))
@SETTINGS
def test_stratified_sample_fraction_and_determinism(spark, frac, n):
    """Deterministic Bernoulli: repeated runs agree exactly, and the
    kept fraction lands near the target (binomial tolerance)."""
    from time_series_data_anomaly_detection_spark.datapipe.sampling import (
        stratified_sample,
    )

    pdf = pd.DataFrame({"doc_id": range(n), "source": "a", "text": "x"})
    df = spark.createDataFrame(pdf)
    k1 = sorted(
        r.doc_id for r in stratified_sample(df, {"a": frac}).collect()
    )
    k2 = sorted(
        r.doc_id for r in stratified_sample(df, {"a": frac}).collect()
    )
    assert k1 == k2
    # 5-sigma binomial bound: |kept - n*frac| <= 5*sqrt(n*frac*(1-frac)) + 1
    import math

    bound = 5 * math.sqrt(n * frac * (1 - frac)) + 1
    assert abs(len(k1) - n * frac) <= bound


@given(
    present=st.lists(st.booleans(), min_size=2, max_size=40),
    step=st.sampled_from([60, 3600]),
)
@SETTINGS
def test_fill_gaps_matches_pandas_interpolation(spark, present, step):
    """fill_gaps vs pandas reindex+interpolate on random gap patterns:
    the grid is complete, observed rows pass through, and interpolated
    values match pandas' linear time interpolation."""
    from time_series_data_anomaly_detection_spark.operators.decompose import (
        fill_gaps,
    )

    present[0] = present[-1] = True  # endpoints anchor the grid
    base = pd.Timestamp("2024-01-01")
    rows = [
        (base + pd.Timedelta(seconds=i * step), float(i * i % 17))
        for i, p in enumerate(present)
        if p
    ]
    pdf = pd.DataFrame(rows, columns=["timestamp", "value"])
    pdf.insert(0, "series_id", "a")
    out = (
        fill_gaps(spark.createDataFrame(pdf), step)
        .toPandas()
        .sort_values("ts_s")
        .reset_index(drop=True)
    )
    assert len(out) == len(present)
    ref = (
        pdf.set_index("timestamp")["value"]
        .reindex(
            pd.date_range(base, periods=len(present), freq=f"{step}s")
        )
        .interpolate(method="index")
    )
    np.testing.assert_allclose(out["value"].to_numpy(), ref.to_numpy(), atol=1e-9)
    assert (out["is_gap"].to_numpy() == (~np.array(present)).astype(int)).all()


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e f"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_runlength_stats_matches_counter_reference(spark, docs):
    """The zero-shuffle sort+fold multiplicity scan must agree with a
    plain Counter over every random token bag: total, max multiplicity,
    and members-of-duplicated-values count."""
    from collections import Counter

    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark.datapipe.decontam import (
        _runlength_stats,
    )

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, toks array<string>",
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", _runlength_stats(F.col("toks")).alias("s")
        ).collect()
    }
    for i, toks in enumerate(docs):
        c = Counter(toks)
        assert out[i]["n"] == len(toks)
        assert out[i]["best"] == (max(c.values()) if c else 0)
        assert out[i]["dup"] == sum(v for v in c.values() if v >= 2)


@given(
    n=st.integers(min_value=0, max_value=300),
    ctx=st.integers(min_value=8, max_value=64),
    overlap=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_documents_invariants(spark, n, ctx, overlap):
    """For any (doc length, ctx, overlap): chunks tile the doc with the
    exact stride, cover every token, and end at the last token."""
    from time_series_data_anomaly_detection_spark.datapipe.packing import (
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [text]})
    )
    out = (
        chunk_documents(df, ctx=ctx, overlap=overlap)
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    stride = ctx - overlap
    assert out["start_tok"].tolist() == [
        i * stride + 1 for i in range(len(out))
    ]
    if n == 0:
        assert len(out) == 1 and out.iloc[0]["n_tok_in_chunk"] == 0
        return
    assert out["end_tok"].iloc[-1] == n
    # coverage: every token index in some [start, end]
    covered = set()
    for _, r in out.iterrows():
        covered.update(range(int(r["start_tok"]), int(r["end_tok"]) + 1))
    assert covered == set(range(1, n + 1))
    # every chunk is at most ctx tokens
    assert (out["n_tok_in_chunk"] <= ctx).all()
    assert (out["n_tok_in_chunk"] >= 1).all()


@given(
    values=st.lists(
        st.floats(-50, 50, allow_nan=False, width=32),
        min_size=3,
        max_size=60,
    ),
    half=st.integers(1, 6),
)
@SETTINGS
def test_hampel_matches_pandas_rolling_median_mad(spark, values, half):
    """Hampel's in-frame sorted-array median/MAD must equal pandas'
    centered rolling median (min_periods=1) and the MAD of the same
    window, on arbitrary inputs and window sizes."""
    from time_series_data_anomaly_detection_spark.operators.robust import (
        hampel_flags,
    )

    values = [float(v) for v in values]
    out = (
        hampel_flags(series_df(spark, values), half=half)
        .orderBy("rn")
        .toPandas()
    )
    s = pd.Series(values)
    win = 2 * half + 1
    ref_med = s.rolling(win, center=True, min_periods=1).median()
    np.testing.assert_allclose(out["roll_med"], ref_med, atol=1e-9)
    n = len(values)
    for i in range(n):
        lo, hi = max(0, i - half), min(n, i + half + 1)
        w = s.iloc[lo:hi]
        ref_mad = (w - out["roll_med"].iloc[i]).abs().median()
        assert out["roll_mad"].iloc[i] == pytest.approx(ref_mad, abs=1e-9)


@given(
    values=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=2,
        max_size=80,
    ),
)
@SETTINGS
def test_ewma_matches_pandas_ewm(spark, values):
    """The EWMA recursion seeded at the series mean must match pandas'
    ewm(alpha=0.25, adjust=False) applied to [mean] + values."""
    from time_series_data_anomaly_detection_spark.functions.control import (
        ewma_chart,
    )

    values = [float(v) for v in values]
    out = (
        ewma_chart(series_df(spark, values))
        .orderBy("rn")
        .toPandas()
    )
    mu = np.mean(values)
    ref = (
        pd.Series([mu] + values)
        .ewm(alpha=0.25, adjust=False)
        .mean()
        .iloc[1:]
        .to_numpy()
    )
    np.testing.assert_allclose(out["ewma"], ref, atol=1e-8)
