"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas transforms (`mapInPandas`).

The container has no image/audio codecs, so the actual decode is
STUBBED: `decode_image` raises NotImplementedError and the pipeline uses
`fake_decode_features` — a deterministic byte-level featurizer — so the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is
real and tested end-to-end. Swapping in PIL/ffmpeg later only changes
the inner function body.
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


def decode_image(payload: bytes) -> "object":
    """Real decode path — requires an image codec, absent here."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg, not available in this container; "
        "use fake_decode_features for the plumbing path"
    )


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
