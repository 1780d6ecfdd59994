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


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary P6 PPM (netpbm spec) in pure
    numpy — no codec library needed, so the decode seam is provable in
    this container.  Returns (height, width*3) float64: one frame per
    pixel ROW, RGB interleaved — the (n_frames, feat_dim) shape
    contract every ``decode_fn`` must meet."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval as whitespace/comment
    # separated tokens, then ONE whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    # int() happily parses '-1': reject non-positive dims / maxval here
    # or the reshape below yields empty or mis-shaped frames downstream
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ValueError(
            f"invalid PPM maxval {maxval} (need 1..255; 16-bit unsupported)"
        )
    pos += 1  # the single whitespace after maxval
    n = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(h, w * 3).astype(np.float64)


def decode_image(payload: bytes) -> np.ndarray:
    """PIL-backed decode for real image formats (PNG/JPEG/...), the
    same (height, width*channels) frame contract as :func:`decode_ppm`.
    Import-gated exactly like the torch LSTM backend: this container
    has no PIL, so the call raises with a clear message; where PIL
    exists the unit parity test proves it returns bit-identical frames
    to the pure-numpy PPM decoder on the same payload."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - container lacks PIL
        raise ImportError(
            "decode_image needs Pillow; in codec-less environments use "
            "decode_ppm (pure numpy) or the default byte-level decoder"
        ) from exc
    import io

    arr = np.asarray(Image.open(io.BytesIO(payload)))
    if arr.ndim == 2:  # grayscale: one channel
        return arr.astype(np.float64)
    return arr.reshape(arr.shape[0], -1).astype(np.float64)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_stride: int = 1,
    decode_fn=None,
) -> DataFrame:
    """Decode + frame-sample + feature-extract over the binary
    ``payload`` column (``mapInPandas``, Arrow-batched).

    Emits one row per sampled frame: (id, frame_id, n_frames,
    byte_sum, f_mean, f_std, f_max). ``byte_sum`` is decoder-
    independent (checksum over raw bytes) and is the oracle-checkable
    part; ``f_*`` come from the decoder.

    ``decode_fn`` is the decode seam: ``bytes -> (n_frames, feat_dim)
    float64``.  ``None`` (default, the gate-pinned path) keeps the
    vectorized byte-histogram stand-in below; :func:`decode_ppm` is a
    REAL pure-numpy image decoder proving the seam in this container;
    :func:`decode_image` swaps in PIL where it exists.  Custom
    decoders run per payload (codecs are per-file anyway); everything
    else — Arrow batching, map-side-only placement, output schema —
    is identical to the fast path.
    """
    schema = (
        f"{id_col} long, frame_id int, n_frames int, byte_sum long, "
        "f_mean double, f_std double, f_max double"
    )

    if decode_fn is not None:

        def gen_decode(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                rows = []
                for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                    p = bytes(p)
                    frames = np.asarray(decode_fn(p), dtype=np.float64)
                    nf = frames.shape[0]
                    width = frames.shape[1] if frames.ndim > 1 else 1
                    frames = frames.reshape(nf, width)
                    mean = frames.sum(axis=1) / width
                    sq = (frames * frames).sum(axis=1) / width
                    std = np.sqrt(np.maximum(sq - mean * mean, 0.0))
                    bsum = int(
                        np.frombuffer(p, dtype=np.uint8)
                        .astype(np.int64)
                        .sum()
                    )
                    for fid in range(0, nf, frame_stride):
                        rows.append(
                            (doc_id, fid, nf, bsum,
                             mean[fid], std[fid], frames[fid].max())
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[id_col, "frame_id", "n_frames", "byte_sum",
                             "f_mean", "f_std", "f_max"],
                )

        return df.select(id_col, "payload").mapInPandas(gen_decode, schema)

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
