"""Multimodal-plumbing queries: binary payload columns + Arrow-batched
feature extraction. The fake featurizer is deterministic byte math, so
DuckDB can oracle it in pure SQL — proving the mapInPandas path
end-to-end, not just rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.multimodal import (
    fake_decode_features,
    with_binary_payload,
)
from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def mm_binary_meta(spark, sf_dir):
    """Opaque binary payload metadata: byte length + digest, computed on
    the binary column (JVM-side)."""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("text")).alias("digest"),
    )


@query(
    "mm_fake_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, least(length(text), 8) + 1),
                                        i -> ascii(substr(text, i, 1)))) AS BIGINT) AS head_sum,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                                        i -> ascii(substr(text, i, 1)))) AS DOUBLE)
             / length(text) AS byte_mean
    FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
)
def mm_fake_decode_features(spark, sf_dir):
    """Arrow-batched mapInPandas featurizer over binary payloads (the
    stubbed decode path — see operators/multimodal.py). Oracle recomputes
    the same byte math in SQL, verifying the whole Arrow round trip."""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    return fake_decode_features(d)
