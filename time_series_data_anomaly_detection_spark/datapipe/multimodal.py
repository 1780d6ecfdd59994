"""Multimodal (binary-column) plumbing: opaque payload bytes + typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode step
is a deterministic byte-level stand-in behind the same interface a
real decoder would use (``decode_fn: bytes -> np.ndarray``): the
Spark-side contract — binary column schema, Arrow batch shape,
partition-parallel UDF, typed output struct — is real and tested;
swapping in PIL/ffmpeg is a one-function change.

Scale notes: payloads never pass through a shuffle (the UDF is a
map-side projection); feature vectors (small, fixed width) are what
flows downstream. At 100 TB keep payloads in their own parquet
column chunk so projection pruning skips them unless decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64  # stand-in "frame" granularity for frame sampling


def as_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media payload: the UTF-8 bytes of ``text_col``
    as a ``binary`` column plus typed metadata (byte length, a
    pretend content-type). Real pipelines read these columns straight
    from parquet."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_bytes", F.length(F.col("payload"))
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: byte histogram moments per
    FRAME_BYTES frame. Replace with a real image/audio decode; shape
    contract: (n_frames, feat_dim).

    std uses the sum-of-squares identity sqrt(max(E[x²]−μ², 0)) — both
    sums are integer-exact in float64, so the result is bit-identical
    to the SQL oracle's same algebra (numpy's ``.std()`` computes
    E[(x−μ)²], a different float path)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n_frames = max(1, int(np.ceil(arr.size / FRAME_BYTES)))
    pad = n_frames * FRAME_BYTES - arr.size
    framed = np.pad(arr, (0, pad)).reshape(n_frames, FRAME_BYTES)
    f_mean = framed.sum(axis=1) / FRAME_BYTES
    f_sq = (framed * framed).sum(axis=1) / FRAME_BYTES
    f_std = np.sqrt(np.maximum(f_sq - f_mean * f_mean, 0.0))
    return np.stack([f_mean, f_std, framed.max(axis=1)], axis=1)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", frame_stride: int = 1
) -> DataFrame:
    """Decode + frame-sample + feature-extract over the binary
    ``payload`` column (``mapInPandas``, Arrow-batched).

    Emits one row per sampled frame: (id, frame_id, n_frames,
    byte_sum, f_mean, f_std, f_max). ``byte_sum`` is decoder-
    independent (checksum over raw bytes) and is the oracle-checkable
    part; ``f_*`` come from the (stand-in) decoder.
    """
    schema = (
        f"{id_col} long, frame_id int, n_frames int, byte_sum long, "
        "f_mean double, f_std double, f_max double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            nf = np.maximum(1, -(-lens // FRAME_BYTES))  # ceil-div, min 1
            # one zero-padded (total_frames, FRAME_BYTES) matrix for the
            # whole Arrow batch: one memcpy per payload, then pure
            # vectorized numpy — no per-row/per-frame Python loop
            offs = np.zeros(len(payloads) + 1, dtype=np.int64)
            np.cumsum(nf, out=offs[1:])
            flat = np.zeros(int(offs[-1]) * FRAME_BYTES, dtype=np.float64)
            for i, p in enumerate(payloads):
                start = offs[i] * FRAME_BYTES
                flat[start : start + lens[i]] = np.frombuffer(p, dtype=np.uint8)
            framed = flat.reshape(-1, FRAME_BYTES)
            s = framed.sum(axis=1)
            f_mean = s / FRAME_BYTES
            f_sq = (framed * framed).sum(axis=1) / FRAME_BYTES
            # sum-of-squares identity, integer-exact in float64: matches
            # the SQL oracle's algebra bitwise (numpy .std() would not)
            f_std = np.sqrt(np.maximum(f_sq - f_mean * f_mean, 0.0))
            f_max = framed.max(axis=1)
            # per-payload byte checksum: padding contributes zero, so a
            # segmented sum of the frame sums is the payload byte sum
            bsum = np.add.reduceat(s, offs[:-1])[: len(payloads)]
            frame_ids = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(
                offs[:-1], nf
            )
            keep = frame_ids % frame_stride == 0
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, nf)[keep],
                    "frame_id": frame_ids[keep].astype(np.int32),
                    "n_frames": np.repeat(nf, nf)[keep].astype(np.int32),
                    "byte_sum": np.repeat(
                        bsum.astype(np.int64), nf
                    )[keep],
                    "f_mean": f_mean[keep],
                    "f_std": f_std[keep],
                    "f_max": f_max[keep],
                }
            )

    return df.select(id_col, "payload").mapInPandas(gen, schema)


def resize_frames(
    df: DataFrame, id_col: str = "doc_id", out_width: int = 16
) -> DataFrame:
    """Stand-in "resize": average-pool each decoded FRAME_BYTES-wide
    frame down to ``out_width`` bins — the byte-domain analogue of
    image downsampling (PIL ``Image.resize`` / ffmpeg ``scale`` swap
    into the same ``mapInPandas`` slot; the Spark-side contract —
    binary in, fixed-width ``array<double>`` out, map-side only, no
    shuffle — is the real plumbing).

    Emits one row per frame: (id, frame_id, frame array<double> of
    ``out_width``).  ``FRAME_BYTES`` must be divisible by
    ``out_width``.
    """
    if FRAME_BYTES % out_width:
        raise ValueError(
            f"out_width must divide FRAME_BYTES={FRAME_BYTES}, got {out_width}"
        )
    pool = FRAME_BYTES // out_width
    schema = f"{id_col} long, frame_id int, frame array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            nf = np.maximum(1, -(-lens // FRAME_BYTES))
            offs = np.zeros(len(payloads) + 1, dtype=np.int64)
            np.cumsum(nf, out=offs[1:])
            flat = np.zeros(int(offs[-1]) * FRAME_BYTES, dtype=np.float64)
            for i, p in enumerate(payloads):
                start = offs[i] * FRAME_BYTES
                flat[start : start + lens[i]] = np.frombuffer(p, dtype=np.uint8)
            pooled = flat.reshape(-1, out_width, pool).mean(axis=2)
            frame_ids = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(
                offs[:-1], nf
            )
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, nf),
                    "frame_id": frame_ids.astype(np.int32),
                    "frame": list(pooled),
                }
            )

    return df.select(id_col, "payload").mapInPandas(gen, schema)
