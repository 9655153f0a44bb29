"""Distributed linear classifiers for model-based corpus filtering —
the "quality classifier" stage of an LLM data pipeline (fasttext-style
filtering re-expressed Spark-first).

Two trainers over the same feature layout:

- :func:`batch_perceptron_train` — batch perceptron with INTEGER
  weights and integer features. Each round is ONE map-side-combined
  aggregate over the (pinned) feature table: the summed gradient of
  the misclassified set, d+2 longs per partition — the same
  rounds-of-one-aggregate shape as the Lloyd/kmeans and BPE loops
  already in this repo, so it holds at 100 TB (driver state is d+1
  ints). Being all-integer it is bit-exactly reproducible in a DuckDB
  recursive CTE, which makes the TRAINING LOOP itself driver-gateable
  (queries/classifier.py) — no weaker rows-only check needed.

- :func:`logreg_train_gd` — full-batch logistic regression GD with
  float weights (probability outputs). Same one-aggregate-per-round
  shape; float exp/sigmoid cannot be oracle-matched bit-exactly across
  engines, so it is property-tested in pytest (loss decreases,
  separable data reaches high accuracy) and its scores are served via
  integer-quantized weights when exactness matters.

Reference parity note: the reference engine (icirellik/minoan-athenaeum)
has no ML surface (SURVEY §2 absences) — this is extension surface for
the 100 TB training-data pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(weights: list[int] | list[float], xcols: list[str]):
    expr = F.lit(weights[0]) * F.col(xcols[0])
    for wi, c in zip(weights[1:], xcols[1:]):
        expr = expr + F.lit(wi) * F.col(c)
    return expr


def batch_perceptron_train(
    feats: DataFrame,
    xcols: list[str],
    ycol: str = "y",
    iters: int = 8,
    lr: int = 1,
    compress_max_rows: int = 65536,
) -> list[tuple[int, ...]]:
    """Batch perceptron over integer features. ``feats`` must have the
    label column (``+1``/``-1`` bigint) and bigint feature columns
    (include an all-ones bias column). Per round, with current weights
    w: the misclassified set is ``y·(w·x) <= 0`` and the update is
    ``w += lr · Σ_mis y·x``.

    Returns one tuple per round: ``(it, mistakes, w0, …, wd)`` where
    ``mistakes`` counts misclassifications at the PREVIOUS round's
    weights and ``w*`` are the weights AFTER the update — exactly the
    rows a DuckDB recursive CTE produces for the same recurrence.

    Execution (optimization r13): every round's aggregate depends on
    the feature ROW only through its value pattern, so the corpus
    first PATTERN-COMPRESSES with one map-side-combined aggregate to
    ``(y, x…, n)`` and, when that table is bounded
    (≤ ``compress_max_rows`` — always true for binary rule features,
    ≤ 2^(d+1) patterns), ALL rounds replay on the driver over the
    compressed table with exact integer arithmetic: 1 corpus pass
    total instead of ``iters`` passes (and one Spark job instead of
    ``iters`` jobs, each of which re-codegens because the weights are
    literals). Integer sums grouped-then-multiplied are bit-identical
    to row-at-a-time sums, so the trajectory is unchanged — pinned by
    tests/test_classifier.py's independent numpy reference and the
    driver's recursive-CTE oracle. Unbounded feature patterns
    (non-binary integer features) exceed the ``take`` cap and fall
    back to the original one-aggregate-per-round loop, with the input
    pinned for the duration.
    """
    grouped = feats.groupBy(ycol, *xcols).agg(
        F.count("*").cast("long").alias("_n")
    )
    head = grouped.take(compress_max_rows + 1)
    if len(head) <= compress_max_rows:
        pats = [
            (
                int(r[ycol]),
                [int(r[c]) for c in xcols],
                int(r["_n"]),
            )
            for r in head
        ]
        w = [0] * len(xcols)
        hist: list[tuple[int, ...]] = []
        for it in range(1, iters + 1):
            g = [0] * len(xcols)
            m = 0
            for y, x, n in pats:
                if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                    m += n
                    for i, xi in enumerate(x):
                        g[i] += y * xi * n
            w = [w[i] + lr * g[i] for i in range(len(xcols))]
            hist.append((it, m, *w))
        return hist
    # Fallback: unbounded pattern space — one aggregate per round over
    # the (pinned) row-level table.
    feats.persist()
    try:
        w = [0] * len(xcols)
        hist = []
        for it in range(1, iters + 1):
            mis = F.col(ycol) * _dot(w, xcols) <= 0
            aggs = [
                F.sum(F.when(mis, F.col(ycol) * F.col(c)).otherwise(0)).alias(
                    f"g{i}"
                )
                for i, c in enumerate(xcols)
            ]
            aggs.append(F.sum(F.when(mis, 1).otherwise(0)).alias("m"))
            r = feats.agg(*aggs).collect()[0]
            w = [w[i] + lr * int(r[f"g{i}"] or 0) for i in range(len(xcols))]
            hist.append((it, int(r["m"] or 0), *w))
        return hist
    finally:
        feats.unpersist()


def logreg_train_gd(
    feats: DataFrame,
    xcols: list[str],
    ycol: str = "label",
    iters: int = 30,
    lr: float = 0.5,
) -> tuple[list[float], list[float]]:
    """Full-batch logistic-regression gradient descent. ``ycol`` is
    0/1; ``xcols`` are numeric (include a bias column of ones; scale
    features to O(1) for a sane learning rate). Per round ONE aggregate
    computes n, Σ x·(σ(w·x) − y) per feature, and the log-loss — all
    JVM expressions (F.exp), map-side combined. Returns (weights,
    per-round losses)."""
    # One pre-pass counts rows AND null labels together: F.sum ignores
    # nulls inside the gradient aggregate, so a null label would
    # silently train a plausible-but-wrong model — fail fast instead
    # (matching apply_merge's posture).
    head = feats.agg(
        F.count("*").alias("n"),
        F.sum(F.col(ycol).isNull().cast("bigint")).alias("n_null"),
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        raise ValueError("logreg_train_gd: empty feature table")
    if int(head["n_null"] or 0) > 0:
        raise ValueError(
            f"logreg_train_gd: {int(head['n_null'])} null values in label "
            f"column {ycol!r} — drop or impute them before training"
        )
    w = [0.0] * len(xcols)
    losses: list[float] = []
    for _ in range(iters):
        z = _dot(w, xcols)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        yc = F.col(ycol).cast("double")
        aggs = [
            F.sum((p - yc) * F.col(c)).alias(f"g{i}") for i, c in enumerate(xcols)
        ]
        # log-loss with the numerically stable log1p(exp(-|z|)) form
        aggs.append(
            F.sum(
                F.when(z >= 0, F.log1p(F.exp(-z)) + (1 - yc) * z).otherwise(
                    F.log1p(F.exp(z)) - yc * z
                )
            ).alias("loss")
        )
        r = feats.agg(*aggs).collect()[0]
        w = [w[i] - lr * float(r[f"g{i}"]) / n for i in range(len(xcols))]
        losses.append(float(r["loss"]) / n)
    return w, losses


def quantize_weights(w: list[float], unit: float = 1e-6) -> list[int]:
    """Round float weights to integer multiples of ``unit`` (micro-units
    by default) for exact integer-logit serving — the shipped-model
    form whose scores any SQL engine reproduces bit-exactly."""
    return [int(math.floor(wi / unit + 0.5)) for wi in w]
