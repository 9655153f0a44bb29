"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas transforms (`mapInPandas`).

Decode status: `decode_image` REALLY decodes binary PPM (P6) — a full
pure-numpy parser (magic, comment-tolerant header, maxval check,
truncation errors), no codec library needed. Compressed formats
(JPEG/PNG, detected by magic bytes) raise NotImplementedError because
the container has no libjpeg/libpng; swapping in PIL later only
changes that dispatch arm. `fake_decode_features` remains as the
codec-free byte-level plumbing path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the feature extractor — fixed and explicit so the
# Arrow batches have a stable shape.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to an (H, W, 3) uint8 array.

    A real, complete parser for the format: magic check, '#' comments
    anywhere in the header, arbitrary whitespace between tokens, maxval
    validation (≤255 single-byte samples), and truncation detection.
    Pure numpy — PPM is uncompressed, so no codec library is needed."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a binary PPM: magic {payload[:2]!r}")
    # Tokenize the header: 3 integers (width, height, maxval), skipping
    # comments ('#' to end of line) and whitespace. The pixel block
    # starts after exactly ONE whitespace byte following maxval.
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad PPM header token {tok!r}")
            tokens.append(int(tok))
            pos = end
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    pos += 1  # the single whitespace byte after maxval
    n = w * h * 3
    px = payload[pos : pos + n]
    if len(px) != n:
        raise ValueError(f"truncated PPM pixels: want {n} bytes, got {len(px)}")
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm`: (H, W, 3) uint8 → P6 bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload by container magic. PPM decodes for real
    (uncompressed — pure numpy); compressed formats need a codec library
    this container does not ship."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "JPEG/PNG decode requires PIL/libjpeg/libpng, not available in "
            "this container; PPM (P6) payloads decode natively"
        )
    raise ValueError(f"unrecognized image container: magic {payload[:8]!r}")


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("down2_checksum", T.LongType()),
    ]
)


def with_ppm_payload(df: DataFrame, width: int = 16, height: int = 8) -> DataFrame:
    """Attach a REAL image payload column: a valid binary PPM (P6) per
    row whose pixel bytes are the deterministic ramp
    ``(doc_id % 251 + 13·i) mod 256`` over flat index i — so downstream
    decode results are reproducible on any engine (the oracle recomputes
    the same ramp in SQL). Stands in for reading an image blob column
    off a lakehouse table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_px = width * height * 3
        ramp = 13 * np.arange(n_px, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_ppm(
                    ((int(d) % 251 + ramp) % 256)
                    .astype(np.uint8)
                    .reshape(height, width, 3)
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id").mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def image_channel_stats(df: DataFrame) -> DataFrame:
    """mapInPandas decode + featurize: parse each payload with the REAL
    PPM decoder, emit dimensions, per-channel means, and a 2× box
    downsample (the "resize" step of an image pipeline, as average-pool
    over 2×2 blocks) reduced to a position-weighted integer checksum —
    Σ (block_index+1)·block_sum — so the pooled GEOMETRY is pinned
    bit-exactly (a transposed or mis-strided pool changes the value)
    while staying engine-portable integer math. Arrow-batched; per-image
    numpy, no Python per pixel."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0)
                n_px = float(h * w)
                h2, w2 = h - h % 2, w - w % 2
                blocks = (
                    img[:h2, :w2, :]
                    .reshape(h2 // 2, 2, w2 // 2, 2, 3)
                    .sum(axis=(1, 3, 4))
                )
                weights = np.arange(1, blocks.size + 1, dtype=np.int64).reshape(
                    blocks.shape
                )
                rows.append(
                    (
                        int(d),
                        w,
                        h,
                        sums[0] / n_px,
                        sums[1] / n_px,
                        sums[2] / n_px,
                        int((weights * blocks).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "down2_checksum",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(stats, IMAGE_STATS_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (utf-8 bytes of the text stand in
    for an image/audio payload) plus typed metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def fake_decode_features(df: DataFrame) -> DataFrame:
    """Deterministic per-payload features via mapInPandas (Arrow
    batches): byte length, sum of the first 8 bytes, mean byte value.
    Partition-parallel, no driver collection — the real decode drops in
    here unchanged.

    The batch body is fully numpy-vectorized: one C-level concat of the
    batch's payloads into a flat uint8 buffer, then ``np.add.reduceat``
    over row offsets — no per-row Python in the hot loop."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(payloads)
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            offsets = np.zeros(n, dtype=np.int64)
            if n > 1:
                np.cumsum(lens[:-1], out=offsets[1:])
            nonempty = lens > 0
            totals = np.zeros(n, dtype=np.int64)
            if buf.size and nonempty.any():
                # reduceat segments for empty rows alias the next row's
                # first byte — computed on nonempty rows only.
                totals[nonempty] = np.add.reduceat(buf, offsets[nonempty])
            head_sum = np.zeros(n, dtype=np.int64)
            for k in range(8):  # 8 vector adds, not a per-row loop
                has_k = lens > k
                head_sum[has_k] += buf[offsets[has_k] + k]
            byte_mean = np.divide(
                totals, lens, out=np.zeros(n, dtype=np.float64), where=nonempty
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens,
                    "head_sum": head_sum,
                    "byte_mean": byte_mean,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)
