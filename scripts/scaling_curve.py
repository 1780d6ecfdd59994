"""Measure how headline queries scale with data volume: run each at
sf0.001 / 0.01 / 0.1 (100x spread) and report wall-clock plus the
0.01→0.1 growth factor.  A near-constant-time query is overhead-bound
(fine); a ~10x query is data-bound linear (the target shape); anything
super-linear is a plan that will not survive 100 TB.

Usage: python scripts/scaling_curve.py [query ...]   (default: headline set)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "rolling_stats",
    "adaptive_flags",
    "mad_scores",
    "detect_events",
    "event_metrics",
    "threshold_sweep",
    "pr_curve",
    "label_windows",
    "walk_forward_cv_ar1",
    "revenue_anomaly",
    "doc_stats",
    "exact_dedup",
    "minhash_lsh",
    "dedup_clusters",
    "corpus_prep",
    "cosine_topk",
    "ivf_topk",
    "pack_chunks",
    "stratified_sample",
    "event_rollup",
    "user_sessions",
    # round-5 hygiene family
    "pii_scan",
    "repetition_stats",
    "decontaminate",
    "semantic_dedup",
    "training_order",
    "curation_pipeline",
    # round-5 continuation: trend/saliency/tokenizer/asof
    "trend_test",
    "matrix_profile",
    "spectral_residual",
    "detect_period",
    "baseline_forecasts",
    "asof_last_label",
    "percentile_summary",
    "bpe_pair_counts",
    "bpe_encode",
    "mixture_schedule",
    # round-5 second session: downsample/EVT/pairwise/composites
    "m4_downsample",
    "pot_threshold",
    "rolling_corr",
    "stl_anomaly",
    "event_impact",
    "seasonal_heatmap",
    "detector_agreement",
    "ensemble_forecast",
    "changepoint_segments",
    # round-6: drift/neighbor/test/symbolic/forecast + datapipe adds
    "page_hinkley",
    "knn_outlier",
    "kde_rarity",
    "croston_forecast",
    "sax_bitmap",
    "variance_ratio",
    "rs_hurst",
    "ks_drift",
    "cusum_squares",
    "forecast_features",
    "holt_linear",
    "hbos_flags",
    "sax_words",
    "ar2_forecast",
    "vocab_stats",
    "winnow_near_dup",
    "distinctive_terms",
    "doc_novelty",
    "compression_ratio",
    "importance_select",
    # round-9: full-extent twins + pinned-tokenizer pipeline
    "matrix_profile_fixed_full",
    "shesd_fixed_full",
    "acf_fft_fixed",
    "bpe_encode_fixed",
    "bpe_merges_fixed",
    "corpus_to_batches_bpe_fixed",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    import __spark_entry__ as entrymod
    from time_series_data_anomaly_detection_spark import get_spark

    spark = get_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in qs]

    # warm once so sf0.001 numbers aren't all JVM startup
    qs[names[0]](spark, "/root/testdata/sf0.01").write.format("noop").mode(
        "overwrite"
    ).save()

    rows = {}
    for name in names:
        t = {}
        for sf in SFS:
            t0 = time.perf_counter()
            qs[name](spark, f"/root/testdata/sf{sf}").write.format(
                "noop"
            ).mode("overwrite").save()
            t[sf] = round(time.perf_counter() - t0, 3)
        growth = round(t["0.1"] / max(t["0.01"], 1e-9), 2)
        rows[name] = {**t, "x_001_to_01": growth}
        print(
            f"# {name:28s} {t['0.001']:7.2f} {t['0.01']:7.2f} "
            f"{t['0.1']:7.2f}  growth(0.01->0.1)={growth}x",
            file=sys.stderr,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
