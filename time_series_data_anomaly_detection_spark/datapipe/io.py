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
    # INTENTIONALLY collide).  source is coalesced to '' BEFORE the
    # concat: concat_ws skips NULL args, so without it a NULL-source
    # row would hash as md5(text) alone and silently collide with
    # same-text docs from other null-source shards.
    return F.conv(
        F.md5(
            F.concat_ws(
                "\x1f", F.coalesce(source.cast("string"), F.lit("")), text
            )
        ).substr(1, 15),
        16,
        10,
    ).cast("long")


def _normalize(df: DataFrame, text_col, id_col, lang_col, source_col,
               default_source) -> DataFrame:
    src = (
        F.col(source_col).cast("string")
        if source_col
        else F.lit(default_source)
    )
    # provided-but-NULL ids fall back to the content id — a NULL
    # doc_id would silently poison every downstream dedup/join key
    doc_id = (
        F.coalesce(
            F.col(id_col).cast("long"), _content_id(src, F.col(text_col))
        )
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
    raw = _read_jsonl_raw(
        spark, path, text_field, id_field, lang_field, source_field
    )
    return _normalize(
        raw, text_field, id_field, lang_field, source_field, default_source
    )


def _read_jsonl_raw(spark, path, text_field, id_field, lang_field,
                    source_field):
    # PERMISSIVE parse with an explicit corrupt-record column so
    # malformed lines are countable (jsonl_ingest_report) instead of
    # vanishing as all-NULL rows into the text-not-null filter
    fields = [f"`{text_field}` string"]
    if id_field:
        fields.append(f"`{id_field}` long")
    if lang_field:
        fields.append(f"`{lang_field}` string")
    if source_field:
        fields.append(f"`{source_field}` string")
    fields.append("`_corrupt_record` string")
    return (
        spark.read.schema(", ".join(fields))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def jsonl_ingest_report(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source_field: str | None = None,
) -> DataFrame:
    """Line-disposition accounting for a JSONL ingest: how many lines
    were kept, how many were malformed JSON (``corrupt``), and how many
    parsed but carried no text (``null_text``) — so crawl ingest loss
    is visible instead of silently dropped by the not-null filter.

    Dispositions mirror what :func:`read_jsonl_corpus` actually does
    with each line (r11 ADVICE: PERMISSIVE also flags valid-JSON lines
    whose NON-text field type-mismatched, and the loader KEEPS those):

    - ``kept`` — clean parse, text present;
    - ``kept_coerced`` — text present but some other declared field
      type-mismatched and was nulled (the loader keeps the row);
    - ``null_text`` — valid JSON, no usable text (dropped);
    - ``corrupt`` — true parse failure: flagged AND no text recovered
      (dropped).

    ``kept + kept_coerced`` therefore equals the loaded document
    count.  Returns ``(disposition string, n_lines long)``, one row
    per non-empty disposition.
    """
    raw = _read_jsonl_raw(
        spark, path, text_field, id_field, lang_field, source_field
    )
    # the text column must appear in the projection alongside the
    # corrupt column — Spark refuses plans that reference ONLY the
    # internal corrupt-record column of a JSON scan
    flagged = F.col("_corrupt_record").isNotNull()
    # PERMISSIVE only flags a type-mismatched field if the scan PARSES
    # it — and column pruning narrows the JSON scan to the fields this
    # expression touches, which would leave id/lang/source mismatches
    # unflagged.  Splice a zero-length substring of every declared
    # field into the 'kept' literal: value unchanged, but the pruner
    # must now keep the full schema in the scan.
    others = [
        f for f in (id_field, lang_field, source_field) if f
    ]
    full_parse_probe = (
        F.substring(
            F.concat_ws("", *[F.col(f).cast("string") for f in others]),
            1, 0,
        )
        if others
        else F.lit("")
    )
    disp = (
        F.when(flagged & F.col(text_field).isNull(), F.lit("corrupt"))
        .when(F.col(text_field).isNull(), F.lit("null_text"))
        .when(flagged, F.lit("kept_coerced"))
        .otherwise(F.concat(F.lit("kept"), full_parse_probe))
    )
    return (
        raw.select(disp.alias("disposition"))
        .groupBy("disposition")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    glob: str = "*.txt",
) -> DataFrame:
    """One document per file → documents frame.  Uses the
    ``binaryFile`` DataFrame source (not RDD ``wholeTextFiles``), so
    listing, pruning and partitioning behave like any other scan; the
    file path ALWAYS becomes ``source`` (there is no default-source
    knob here — a per-file corpus has an unambiguous provenance) and
    the id derives from content."""
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
        None,
    )
