"""Distributed linear classifiers (operators/classifier.py) — the
batch-perceptron recurrence against an independent numpy reference,
logistic-regression GD convergence properties, and weight quantization.
The oracle-exactness of the gated training/eval queries is covered by
tests/test_oracle_parity.py (they are registered queries)."""

import numpy as np
import pytest


def _synthetic(spark, n=400, d=4, seed=7, separable=True):
    rng = np.random.RandomState(seed)
    X = rng.randint(0, 2, size=(n, d)).astype(np.int64)
    true_w = np.array([2, -3, 1, 4][:d])
    margin = X @ true_w - 1
    y = np.where(margin > 0, 1, -1)
    if not separable:
        flip = rng.rand(n) < 0.15
        y = np.where(flip, -y, y)
    rows = [
        (int(y[i]), 1, *[int(v) for v in X[i]]) for i in range(n)
    ]
    cols = "y long, x0 long, " + ", ".join(f"x{j + 1} long" for j in range(d))
    return spark.createDataFrame(rows, cols), X, y


def test_batch_perceptron_matches_numpy_reference(spark):
    from minoan_athenaeum_spark.operators.classifier import batch_perceptron_train

    df, X, y = _synthetic(spark, separable=False)
    xcols = ["x0"] + [f"x{j + 1}" for j in range(X.shape[1])]
    hist = batch_perceptron_train(df.repartition(8), xcols, "y", iters=6, lr=1)
    # independent reference: same recurrence, pure numpy
    Xb = np.column_stack([np.ones(len(X), dtype=np.int64), X])
    w = np.zeros(Xb.shape[1], dtype=np.int64)
    for it in range(1, 7):
        mis = y * (Xb @ w) <= 0
        m = int(mis.sum())
        w = w + (y[mis, None] * Xb[mis]).sum(axis=0)
        assert hist[it - 1] == (it, m, *[int(v) for v in w])


def test_batch_perceptron_separable_reaches_zero_mistakes(spark):
    from minoan_athenaeum_spark.operators.classifier import batch_perceptron_train

    df, X, y = _synthetic(spark, separable=True)
    xcols = ["x0"] + [f"x{j + 1}" for j in range(X.shape[1])]
    hist = batch_perceptron_train(df, xcols, "y", iters=25, lr=1)
    assert min(h[1] for h in hist) == 0


def test_logreg_gd_converges_on_separable_data(spark):
    from minoan_athenaeum_spark.operators.classifier import (
        logreg_train_gd,
        quantize_weights,
    )

    df, X, y = _synthetic(spark, separable=True)
    df = df.withColumn("label", (df["y"] + 1) / 2)  # 0/1 labels
    xcols = ["x0"] + [f"x{j + 1}" for j in range(X.shape[1])]
    w, losses = logreg_train_gd(df, xcols, "label", iters=60, lr=1.0)
    # loss decreases overall and ends low
    assert losses[-1] < losses[0] / 2
    assert losses[-1] == min(losses)
    # accuracy of the learned model
    Xb = np.column_stack([np.ones(len(X)), X]).astype(float)
    pred = np.where(Xb @ np.array(w) > 0, 1, -1)
    assert (pred == y).mean() >= 0.95
    # quantized integer weights keep the same decisions (unit fine enough)
    wq = np.array(quantize_weights(w, unit=1e-6), dtype=np.int64)
    predq = np.where(Xb @ wq > 0, 1, -1)
    assert (predq == pred).mean() >= 0.99


def test_logreg_empty_input_raises(spark):
    from minoan_athenaeum_spark.operators.classifier import logreg_train_gd

    df = spark.createDataFrame([], "label long, x0 long")
    with pytest.raises(ValueError, match="empty feature table"):
        logreg_train_gd(df, ["x0"], "label", iters=1)


def test_averaged_model_is_stable_where_final_oscillates(spark, sf_dir):
    # The documented reason for weight averaging: on the non-separable
    # quality-distillation task the per-round weights oscillate, the
    # averaged model doesn't. Assert the averaged model's error is no
    # worse than the best single round seen (within 2x) and far better
    # than the worst.
    from minoan_athenaeum_spark.queries.classifier import (
        _ITERS,
        _XCOLS,
        _features,
        batch_perceptron_train,
    )

    feats = _features(spark, sf_dir)
    hist = batch_perceptron_train(feats, _XCOLS, "y", iters=_ITERS, lr=1)
    mistakes = [h[1] for h in hist]
    n = feats.count()
    s = [sum(row[2 + i] for row in hist) for i in range(len(_XCOLS))]
    import pyspark.sql.functions as F

    dot = F.lit(s[0]) * F.col("x0")
    for si, c in zip(s[1:], _XCOLS[1:]):
        dot = dot + F.lit(si) * F.col(c)
    avg_err = feats.where(F.col("y") * dot <= 0).count()
    assert avg_err <= 2 * min(mistakes[1:])
    assert avg_err < max(mistakes[1:]) / 2
    assert avg_err / n < 0.15
