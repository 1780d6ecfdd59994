"""Dump .explain('formatted') for every registered query to a directory.

Usage: python scripts/r13_explain_dump.py <outdir> [sf_dir] [query ...]

Used for the r13 optimization round's before/after plan artifacts
(plans/r13/<query>_{before,after}.txt).  Also emits a one-line summary
per query (exchange count, join strategies, python-eval nodes) to
<outdir>/SUMMARY.tsv so plan-shape regressions are greppable.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.session import release_caches

    spark = get_spark(app_name="r13-explain")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    rows = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        release_caches()
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:
            text = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_bev = len(re.findall(r"BatchEvalPython", text))
        n_aev = len(re.findall(r"ArrowEvalPython", text))
        n_fmp = len(re.findall(r"FlatMapGroupsInPandas|MapInPandas|MapInArrow", text))
        joins = sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", text))
        )
        rows.append(
            f"{name}\tExchange={n_ex}\tBatchEval={n_bev}\tArrowEval={n_aev}\tGroupedMap={n_fmp}\tjoins={','.join(joins) or '-'}"
        )
        print(rows[-1], file=sys.stderr)
    release_caches()
    with open(os.path.join(outdir, "SUMMARY.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
