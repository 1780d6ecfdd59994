"""Persisted dedup index: scan the lake ONCE, dedup every future
ingest batch against the stored index.

``incremental_dedup(corpus, batch)`` re-derives the corpus-side
frames per call — right for tests, wrong for a 100 TB lake.  This
module materializes those exact frames (content digests, LSH band
keys, shingle hashes, shingle counts) as parquet once, so each daily
batch pays only: one scan of the index digest table, one band-table
equi-join against the batch's broadcast band keys, and shingle
verification for the candidates.  Append-only maintenance: admitted
docs' index rows are appended (``extend_dedup_index``) — no rebuild.

Layout (all plain parquet, co-partitioned by their join keys at
write so large-lake reads start hash-distributed):

    {path}/digests/   dup_group                 (distinct)
    {path}/bands/     doc_id, band, band_key
    {path}/shingles/  doc_id, shingle_hash
    {path}/sizes/     doc_id, n_sh
    {path}/meta/      format_version, hash_family, shingle_n  (1 row)

The ``meta`` table pins the index to the MinHash hash family and
shingle width it was built with.  Band keys and shingle hashes are
only meaningful under the exact ``PERM_A``/``PERM_B``/``MERSENNE_P``
constants that produced them — r12 replaced the degenerate r04 family,
and an index persisted under one family silently never near-dup-matches
batches hashed under another (the band-key equi-join finds nothing, no
error).  ``load_dedup_index`` therefore REFUSES an index whose stamp
does not match the running constants, turning that silent miss into a
loud rebuild instruction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from .dedup import BAND_ROWS, MERSENNE_P, NUM_PERM, PERM_A, PERM_B
from .dedup import _incremental_core, corpus_index_frames
from ._skew import DEFAULT_BUCKET_CAP

_PARTS = ("digests", "bands", "shingles", "sizes")

# Bump when the on-disk table layout itself changes shape.
INDEX_FORMAT_VERSION = 2

# Fingerprint of every constant that shapes band keys / shingle hashes:
# a changed permutation family (or banding geometry, or modulus) gives a
# different digest, so a stale index fails loudly instead of matching
# nothing.  text normalization is pinned transitively: it feeds the
# 48-bit shingle hash whose family these constants extend.
HASH_FAMILY = hashlib.sha256(
    repr((MERSENNE_P, NUM_PERM, BAND_ROWS, PERM_A, PERM_B)).encode()
).hexdigest()[:16]


def _write_meta(spark: SparkSession, path: str, n: int) -> None:
    spark.createDataFrame(
        [(INDEX_FORMAT_VERSION, HASH_FAMILY, n)],
        "format_version int, hash_family string, shingle_n int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def check_index_meta(spark: SparkSession, path: str, n: int | None = None) -> None:
    """Fail loudly unless the index at ``path`` was built by THIS code's
    hash family (and, when given, the same shingle width ``n``)."""
    try:
        row = spark.read.parquet(f"{path}/meta").head()
    except Exception as exc:  # missing meta = pre-versioned / foreign index
        raise ValueError(
            f"dedup index at {path!r} has no meta table — it predates "
            f"index versioning (or is not a dedup index). Rebuild it with "
            f"build_dedup_index; band keys from an unknown hash family "
            f"would silently match nothing."
        ) from exc
    if row is None or row.format_version != INDEX_FORMAT_VERSION:
        got = None if row is None else row.format_version
        raise ValueError(
            f"dedup index at {path!r}: format_version {got} != "
            f"{INDEX_FORMAT_VERSION}; rebuild with build_dedup_index."
        )
    if row.hash_family != HASH_FAMILY:
        raise ValueError(
            f"dedup index at {path!r} was built under MinHash family "
            f"{row.hash_family}, but this build hashes with {HASH_FAMILY} "
            f"(PERM_A/PERM_B/banding changed). Its band keys would match "
            f"nothing — rebuild the index."
        )
    if n is not None and row.shingle_n != n:
        raise ValueError(
            f"dedup index at {path!r} was built with shingle n="
            f"{row.shingle_n}, queried with n={n}; shingle hashes would "
            f"never collide. Use n={row.shingle_n} or rebuild."
        )


def _keys(id_col: str) -> dict:
    return {
        "digests": ["dup_group"],
        "bands": ["band", "band_key"],
        "shingles": [id_col],
        "sizes": [id_col],
    }


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One corpus scan → the four index tables, repartitioned on
    their downstream join keys."""
    frames = corpus_index_frames(corpus, n, text_col, id_col)
    keys = _keys(id_col)
    for name in _PARTS:
        df = frames[name]
        df.repartition(*keys[name]).write.mode("overwrite").parquet(
            f"{path}/{name}"
        )
    _write_meta(corpus.sparkSession, path, n)


def extend_dedup_index(
    admitted: DataFrame,
    path: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append the ADMITTED docs of a batch (verdict 'new') to the
    index — the post-ingest maintenance step.  Append-only parquet;
    digest distinctness is restored lazily at read (a duplicate
    digest row changes no verdict)."""
    check_index_meta(admitted.sparkSession, path, n)
    frames = corpus_index_frames(admitted, n, text_col, id_col)
    keys = _keys(id_col)
    for name in _PARTS:
        frames[name].repartition(*keys[name]).write.mode("append").parquet(
            f"{path}/{name}"
        )


def load_dedup_index(
    spark: SparkSession, path: str, n: int | None = None
) -> dict:
    check_index_meta(spark, path, n)
    idx = {name: spark.read.parquet(f"{path}/{name}") for name in _PARTS}
    # append-only maintenance can introduce duplicate digest rows
    idx["digests"] = idx["digests"].distinct()
    return idx


def repair_dedup_index(
    corpus: DataFrame,
    path: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Restore the index invariant "every corpus doc is fully indexed":
    re-extend the index with corpus docs missing from the ``sizes``
    table.  Returns the number of repaired docs.

    The one crash window append-only maintenance cannot make idempotent
    on its own: a failure BETWEEN ``extend_dedup_index``'s four table
    appends (digests land first) makes the replayed batch see its docs
    as exact duplicates — they stay in the corpus but never get
    bands/shingles/sizes rows, so near-dup suppression silently skips
    them.  Run this (then :func:`compact_dedup_index`, which drops the
    duplicate rows re-extension creates) after any unclean ingest
    shutdown; both are no-ops on a healthy index."""
    spark = corpus.sparkSession
    check_index_meta(spark, path, n)
    indexed = spark.read.parquet(f"{path}/sizes").select(id_col)
    missing = corpus.join(indexed, id_col, "left_anti")
    n_missing = missing.count()
    if n_missing:
        extend_dedup_index(missing, path, n, text_col, id_col)
    return n_missing


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _dir_stats(spark: SparkSession, path: str) -> dict:
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(jpath):
        return {"files": 0, "bytes": 0}
    s = fs.getContentSummary(jpath)
    return {"files": int(s.getFileCount()), "bytes": int(s.getLength())}


def compact_dedup_index(
    spark: SparkSession,
    path: str,
    retire: DataFrame | None = None,
    id_col: str = "doc_id",
    target_partitions: int | None = None,
) -> dict:
    """Bound the growth of the append-only index: rewrite each table
    with exact-duplicate rows removed, co-partitioned AND sorted on its
    join key, in a bounded number of files.  Returns per-table
    files/bytes before and after plus the wall seconds.

    Append-only maintenance grows the index two ways a rewrite can
    reclaim: (1) every ``extend_dedup_index`` call adds a new file set
    per table — after thousands of micro-batches the band join opens
    thousands of small parquet files; (2) a crash between the four
    table appends followed by a driver retry can append the same doc's
    rows twice, and duplicated shingle rows DOUBLE-count in the
    verification ``inter`` aggregate (a near-miss pair could cross the
    Jaccard threshold).  Compaction removes both: ``dropDuplicates``
    over full rows is exact-preserving for admission decisions — a
    clean index is a set per table, so verdicts for any future batch
    are IDENTICAL pre/post compact (pinned by the parity unit test).
    Sorting within partitions clusters ``band_key`` / ``dup_group``
    into parquet row groups, so at 100 TB the per-batch band equi-join
    and digest semi-join prune row groups by min/max instead of
    scanning the full table.

    ``retire`` (optional, one ``id_col`` column): the retirement
    policy — those docs' bands/shingles/sizes rows are dropped, so
    retired documents stop near-dup-suppressing future batches.  Their
    content DIGESTS remain (an exact byte-identical re-post of retired
    content is still rejected — digests carry no doc_id, and keeping
    them keeps the exact layer append-only-correct).  Retirement
    intentionally changes future admissions for near-dups of retired
    docs; everything else is untouched.

    The rewrite stages under ``{path}/__compact__`` and swaps each
    table directory via two FS renames (atomic per table on HDFS-like
    stores).  Run it between micro-batches — the ingest loop's
    ``foreachBatch`` is sequential, so a compact scheduled there is
    race-free by construction.
    """
    import time as _time

    t0 = _time.time()
    check_index_meta(spark, path)
    n_parts = target_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keys = _keys(id_col)
    stats: dict = {}
    staged = f"{path}/__compact__"
    for name in _PARTS:
        df = spark.read.parquet(f"{path}/{name}").dropDuplicates()
        if retire is not None and name != "digests":
            df = df.join(
                retire.select(id_col).hint("broadcast"), id_col, "left_anti"
            )
        (
            df.repartition(n_parts, *keys[name])
            .sortWithinPartitions(*keys[name])
            .write.mode("overwrite")
            .parquet(f"{staged}/{name}")
        )
    fs, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    for name in _PARTS:
        live, new = Path(f"{path}/{name}"), Path(f"{staged}/{name}")
        trash = Path(f"{path}/__retired_{name}")
        before = _dir_stats(spark, f"{path}/{name}")
        fs.delete(trash, True)
        if not fs.rename(live, trash):
            raise IOError(f"compact: could not stage out {path}/{name}")
        if not fs.rename(new, live):
            fs.rename(trash, live)  # roll back this table
            raise IOError(f"compact: could not swap in {path}/{name}")
        fs.delete(trash, True)
        stats[name] = {"before": before, "after": _dir_stats(spark, f"{path}/{name}")}
    fs.delete(Path(staged), True)
    stats["seconds"] = round(_time.time() - t0, 2)
    return stats


def incremental_dedup_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """The daily ingest query: batch vs the persisted index — same
    verdict ladder and values as ``incremental_dedup`` against the
    live corpus (pinned by the round-trip test), without touching the
    corpus itself."""
    idx = load_dedup_index(spark, path, n)
    return _incremental_core(
        idx, batch, n, threshold, text_col, id_col, bucket_cap
    )
