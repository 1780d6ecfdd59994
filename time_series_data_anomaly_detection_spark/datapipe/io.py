"""Raw-corpus ingestion: JSONL and file-tree sources normalized to the
``documents`` schema every datapipe operator consumes
(``doc_id long, text string, lang string, source string,
n_chars int``).

Real training-data pipelines start from crawl exports (JSONL, one doc
per line) or document trees (one doc per file), not from parquet — the
synthetic ``documents.parquet`` testdata stands in for a lake table
that something ingested first.  These loaders are that something,
Spark-native end to end:

- ``read_jsonl_corpus``: ``spark.read.json`` with an enforced schema
  (no sampling-based inference pass at scale) over ``*.jsonl`` /
  ``*.json.gz`` globs — line-split, codec-decoded and distributed by
  the source itself.
- ``read_text_corpus``: one document per FILE via the ``binaryFile``
  DataFrame source (+ UTF-8 decode in the projection) — no RDD
  ``wholeTextFiles``, so predicate/column pruning and file listing
  parallelism behave like any other scan.

Document identity: when the data carries no id column, ``doc_id`` is
derived from CONTENT (first 15 hex digits of md5 over source+text →
a positive long, the ``text.hash48`` recipe widened).  Content-derived
ids are deterministic across runs/partitionings — a
``monotonically_increasing_id`` would renumber on every repartition,
silently breaking incremental dedup indexes and any downstream join.
Exact-duplicate documents therefore SHARE an id by construction; the
dedup operators treat that as already-exact-deduped input (document
the choice, don't fight it: identical text is one document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int"
)


def _content_id(source, text):
    # 60-bit positive long from md5(source || '\x1f' || text) — the
    # hash48 recipe widened to 15 hex digits (collision odds ~n²/2⁶¹;
    # at 1e9 docs ≈ 4e-4 — acceptable for ingest ids, and exact dups
    # INTENTIONALLY collide)
    return F.conv(
        F.md5(F.concat_ws("\x1f", source, text)).substr(1, 15), 16, 10
    ).cast("long")


def _normalize(df: DataFrame, text_col, id_col, lang_col, source_col,
               default_source) -> DataFrame:
    src = (
        F.col(source_col).cast("string")
        if source_col
        else F.lit(default_source)
    )
    doc_id = (
        F.col(id_col).cast("long")
        if id_col
        else _content_id(src, F.col(text_col))
    )
    lang = F.col(lang_col).cast("string") if lang_col else F.lit(None).cast("string")
    text = F.col(text_col).cast("string")
    return df.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).cast("int").alias("n_chars"),
    ).filter(F.col("text").isNotNull())


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source_field: str | None = None,
    default_source: str = "jsonl",
) -> DataFrame:
    """JSONL corpus → documents frame.  The read schema is built from
    the requested fields (all strings except an optional numeric id),
    NOT inferred — schema inference runs a whole extra pass over the
    data at scale and silently widens types between drops."""
    fields = [f"`{text_field}` string"]
    if id_field:
        fields.append(f"`{id_field}` long")
    if lang_field:
        fields.append(f"`{lang_field}` string")
    if source_field:
        fields.append(f"`{source_field}` string")
    raw = spark.read.schema(", ".join(fields)).json(path)
    return _normalize(
        raw, text_field, id_field, lang_field, source_field, default_source
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    glob: str = "*.txt",
    default_source: str = "files",
) -> DataFrame:
    """One document per file → documents frame.  Uses the
    ``binaryFile`` DataFrame source (not RDD ``wholeTextFiles``), so
    listing, pruning and partitioning behave like any other scan; the
    file path becomes ``source`` and the id derives from content."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("__path"),
            F.decode(F.col("content"), "UTF-8").alias("__text"),
        )
    )
    return _normalize(
        raw.select(
            F.col("__text").alias("text"),
            F.col("__path").alias("src"),
        ),
        "text",
        None,
        None,
        "src",
        default_source,
    )
