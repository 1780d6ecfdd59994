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
    contract: (n_frames, feat_dim)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n_frames = max(1, int(np.ceil(arr.size / FRAME_BYTES)))
    pad = n_frames * FRAME_BYTES - arr.size
    framed = np.pad(arr, (0, pad)).reshape(n_frames, FRAME_BYTES)
    return np.stack(
        [framed.mean(axis=1), framed.std(axis=1), framed.max(axis=1)], axis=1
    )


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
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                feats = _fake_decode(payload)
                n_frames = feats.shape[0]
                bsum = int(np.frombuffer(payload, dtype=np.uint8).sum())
                for fid in range(0, n_frames, frame_stride):
                    out.append(
                        (
                            row[id_col],
                            fid,
                            n_frames,
                            bsum,
                            float(feats[fid, 0]),
                            float(feats[fid, 1]),
                            float(feats[fid, 2]),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col,
                    "frame_id",
                    "n_frames",
                    "byte_sum",
                    "f_mean",
                    "f_std",
                    "f_max",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(gen, schema)
