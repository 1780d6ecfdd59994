"""Same-session A/B: decimal(38,0) vs int64-folded MinHash affine, and
full- vs half-spectrum FFT-ACF twin.  Alternating warm cells so JIT and
host drift hit both variants equally.

Usage: python scripts/r13_ab_minhash_fft.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from time_series_data_anomaly_detection_spark import get_spark
    from time_series_data_anomaly_detection_spark.datapipe.dedup import (
        MERSENNE_P,
        PERM_A,
        PERM_B,
        minhash_signatures_from,
        shingles,
    )
    from time_series_data_anomaly_detection_spark.plans import registry_datapipe as rd
    from time_series_data_anomaly_detection_spark.session import release_caches

    spark = get_spark(app_name="r13-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = rd._docs(spark, SF)
    sh = shingles(docs, 3).cache()
    sh.count()

    def sig_decimal(num_perm):
        aggs = [
            F.min(
                (
                    (
                        F.lit(PERM_A[i]).cast("decimal(20,0)")
                        * F.col("shingle_hash")
                        + F.lit(PERM_B[i])
                    )
                    % F.lit(MERSENNE_P)
                ).cast("long")
            ).alias(f"m{i}")
            for i in range(num_perm)
        ]
        return sh.groupBy("doc_id").agg(*aggs)

    def sig_long(num_perm):
        return minhash_signatures_from(sh, "doc_id", num_perm=num_perm)

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for label, fn in [
        ("sig16_decimal", lambda: sig_decimal(16)),
        ("sig16_long", lambda: sig_long(16)),
        ("sig48_decimal", lambda: sig_decimal(48)),
        ("sig48_long", lambda: sig_long(48)),
    ]:
        run(fn())  # warm the plan once
    for rep in range(3):
        for label, fn in [
            ("sig16_decimal", lambda: sig_decimal(16)),
            ("sig16_long", lambda: sig_long(16)),
            ("sig48_decimal", lambda: sig_decimal(48)),
            ("sig48_long", lambda: sig_long(48)),
        ]:
            spark.sparkContext.setJobDescription(f"{label}#r{rep}")
            out.setdefault(label, []).append(run(fn()))
    # value parity of the two variants (both configs)
    for np_ in (16, 48):
        a = sig_decimal(np_)
        b = sig_long(np_)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        out[f"parity_{np_}"] = diff
    release_caches()
    sh.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
