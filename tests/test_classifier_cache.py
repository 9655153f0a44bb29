"""Pin for the warehouse-cached averaged perceptron weights (r13):
cached ≡ retrained (bit-exact integers), fingerprint-keyed freshness
(a different corpus resolves to a different cache), and the scoring
queries' oracles stay valid because they replay the full training
recurrence onto the same integers."""

from __future__ import annotations

import json
import os

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cached_weights_equal_retrained(spark):
    from minoan_athenaeum_spark.operators.classifier import (
        batch_perceptron_train,
    )
    from minoan_athenaeum_spark.queries.classifier import (
        _D,
        _ITERS,
        _XCOLS,
        _features,
        averaged_weights,
    )
    from minoan_athenaeum_spark.sources.index_family import (
        warehouse_index_path,
    )

    path = warehouse_index_path(spark, SF, "mas_perceptron", "documents")
    assert path is not None
    cache = os.path.join(path, "weights.json")
    if os.path.isfile(cache):
        os.remove(cache)

    w_first = averaged_weights(spark, SF)  # trains + writes the cache
    assert os.path.isfile(cache)
    w_cached = averaged_weights(spark, SF)  # must hit the cache
    assert w_cached == w_first

    hist = batch_perceptron_train(
        _features(spark, SF), _XCOLS, "y", iters=_ITERS, lr=1
    )
    w_direct = [sum(row[2 + i] for row in hist) for i in range(_D)]
    assert w_first == w_direct
    with open(cache, encoding="utf-8") as fh:
        assert json.load(fh) == w_direct


def test_cache_is_fingerprint_keyed(spark, tmp_path):
    """Two different corpora must never share a weights cache."""
    from minoan_athenaeum_spark.sources.index_family import (
        warehouse_index_path,
    )

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    pd.DataFrame(
        [(1, "good text here", "en", "s")],
        columns=["doc_id", "text", "lang", "source"],
    ).to_parquet(f"{a}/documents.parquet", index=False)
    pd.DataFrame(
        [(2, "entirely other corpus", "en", "s")],
        columns=["doc_id", "text", "lang", "source"],
    ).to_parquet(f"{b}/documents.parquet", index=False)
    pa = warehouse_index_path(spark, str(a), "mas_perceptron", "documents")
    pb = warehouse_index_path(spark, str(b), "mas_perceptron", "documents")
    assert pa != pb
