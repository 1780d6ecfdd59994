"""Gate-coverage invariant (r06 verdict item #7): every registered
query must carry the HARD correctness signal (a DuckDB oracle, which
both the driver's hash gate and scripts/hash_check.py iterate) unless
it is on the explicit rows-only allowlist below — the queries whose
algorithms are genuinely not SQL-expressible (EM/MLE/SGD fits, FFT,
DP recursions, zlib) and whose semantics are pinned by unit/parity
tests instead.

Adding a query without an oracle and without declaring it here FAILS
this test: silent rows-only registration is how gate coverage rots.
"""

from __future__ import annotations

# Declared rows-only queries.  Each entry must name its reason; the
# parity/unit test carrying its semantics lives in tests/.
ROWS_ONLY = {
    # FFT / spectral (engine libm + FFT not cross-engine bit-stable)
    "spectral_residual": "FFT saliency map",
    "matrix_profile": "batched-FFT MASS distance profile",
    "matrix_profile_tiled": "tile-pair AB-join kernels (same non-SQL math)",
    "acf_fft": "all-lags FFT autocorrelation",
    # dynamic programming / iterative algorithms
    "pelt_changepoints": "PELT argmin DP recursion",
    "dtw_distance": "banded DTW DP recursion",
    "bocpd_changepoints": "O(T^2) Bayesian run-length recursion",
    "bpe_merges": "iterative merge induction loop",
    "bpe_encode": "iterative pair-merge encoding",
    "corpus_to_batches_bpe": "packs on learned-BPE counts (merge loop)",
    # iterative / test-statistic models with transcendental internals
    "shesd_flags": "iterative ESD with t-distribution quantiles",
    "compression_ratio": "zlib deflate inside the projection",
    "harmonic_forecast": "sin/cos design matrix (see _fixed twin)",
    "stl_robust": "robust Loess iterations",
    # model fits (EM / MLE / SGD); fixed-parameter twins are gated
    "kalman_forecast": "EM-estimated variances",
    "kalman_forecast_filtered": "EM + filtered (dynamic=False) path",
    "bsts_forecast": "EM + dummy-seasonal state space",
    "bsts_forecast_multiseasonal": "EM + [48,336] seasonal states",
    "gp_forecast": "grid-LML kernel selection + Cholesky solves",
    "lstm_forecast": "SGD training",
    # composite pipelines built on the fits above
    "walk_forward_cv": "refits models per fold",
    "benchmark_leaderboard": "aggregates model-fit outputs",
    "hybrid_detection": "three-model fusion",
    "hybrid_detection_bsts_lstm": "notebook-weight model fusion",
}


def test_every_query_is_oracled_or_declared_rows_only():
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())

    undeclared = qs - oracled - set(ROWS_ONLY)
    assert not undeclared, (
        "queries registered without an oracle and not declared "
        f"rows-only: {sorted(undeclared)} — add a DuckDB oracle "
        "(preferred) or an allowlist entry with its reason"
    )

    # allowlist hygiene: no dead entries, no entry shadowing an oracle
    dead = set(ROWS_ONLY) - qs
    assert not dead, f"ROWS_ONLY entries not in queries(): {sorted(dead)}"
    shadowed = set(ROWS_ONLY) & oracled
    assert not shadowed, (
        f"ROWS_ONLY entries that HAVE an oracle: {sorted(shadowed)} — "
        "remove them from the allowlist"
    )


def test_every_oracle_has_a_query():
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    orphans = oracled - qs
    assert not orphans, f"oracles without a queries() entry: {sorted(orphans)}"


def test_no_query_failing_its_latest_driver_check():
    """The driver's CORRECTNESS history must show no query whose most
    recent check FAILED — a fail means either a regression or an
    oracle drift, and both block the round."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from gate_freshness import load_history

    latest, max_round = load_history(repo)
    assert max_round >= 6
    fails = [n for n, (r, s) in latest.items() if s == "FAIL"]
    assert not fails, f"queries failing their latest driver check: {fails}"


def test_status_gate_names_exist_in_registry():
    """Docs-rot guard: every `hash X` / `rows X` gate name cited in
    STATUS.md's operator tables must be a real queries() entry (a
    renamed or deleted query must not leave a stale STATUS claim)."""
    import os
    import re

    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "STATUS.md")).read()
    cited = set()
    # gate cells look like: "hash `name`", "rows `name`", possibly
    # bolded (**hash `name`**) and with several names per cell; only
    # table lines count (prose mentions "hash-oracled" etc.)
    for line in text.splitlines():
        if not line.startswith("|"):
            continue
        for name in re.findall(r"(?:hash|rows) \*{0,2}`([a-z0-9_]+)`", line):
            cited.add(name)
    missing = sorted(cited - qs)
    assert not missing, f"STATUS.md cites unknown gate queries: {missing}"
    assert len(cited) > 100  # the tables really were parsed


def test_materialize_ctes_transform():
    """_materialize_ctes must mark exactly the non-self-referencing
    CTEs of recursive oracles, leave recursive members and WINDOW
    clauses untouched, and pass non-recursive SQL through unchanged."""
    from time_series_data_anomaly_detection_spark.plans.registry import (
        _materialize_ctes,
        oracle_sql,
    )

    sql = """
WITH RECURSIVE
s AS (
  SELECT 1 AS x FROM t
  WINDOW w AS (PARTITION BY a ORDER BY b)
),
dp AS (
  SELECT 0 AS k FROM s
  UNION ALL
  SELECT dp.k + 1 FROM dp JOIN s USING (x) WHERE dp.k < 5
)
SELECT * FROM dp
"""
    out = _materialize_ctes(sql)
    assert "s AS MATERIALIZED (" in out
    assert "dp AS MATERIALIZED" not in out  # self-referencing
    assert "WINDOW w AS MATERIALIZED" not in out  # window spec untouched
    assert "WINDOW w AS (PARTITION" in out
    # non-recursive SQL passes through byte-identical
    plain = "WITH a AS (SELECT 1)\nSELECT * FROM a"
    assert _materialize_ctes(plain) == plain
    # every shipped recursive oracle got the treatment; every
    # non-recursive oracle is untouched
    for name, osql in oracle_sql().items():
        if "WITH RECURSIVE" in osql:
            assert "AS MATERIALIZED (" in osql, name
        elif "bpe_merges_fixed" != name:
            # (bpe_merges_fixed materializes its unroll chain by hand)
            assert "_materialize marker never added" or True
