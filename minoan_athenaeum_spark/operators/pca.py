"""One-pass second-moment (Gram / covariance) accumulation over
embedding columns, and the driver-side PCA solve it feeds.

The scale problem: computing a covariance matrix by exploding
(row, i, j) pairs multiplies the corpus by dim² (4096× at dim=64) —
fine for an oracle twin, fatal at 100 TB. The production path here is
ONE Arrow mapInPandas pass: each partition accumulates the integer
Gram matrix Gᵀ = XᵀX, the column sums, and the row count with numpy
int64 matmuls over quantized vectors, then emits the ~dim²/2 cells
once per partition. The downstream reduce is a tiny groupBy over
≤ cells·P rows. Everything is exact integer arithmetic (inputs are the
same ×10000-quantized bigints the similarity family uses), so a DuckDB
explode twin certifies the one-pass accumulation bit-for-bit.

From the exact sums, :func:`pca_components` forms the covariance on
the driver (dim×dim floats — a bounded model artifact, same class as
the IVF centroids / PQ codebooks) and eigendecomposes it with a
deterministic sign convention. At 100 TB the covariance pass is
map-only with a dim²-sized shuffle payload per partition; the eigh is
O(dim³) driver work — microseconds at embedding dims.

Overflow bound: |q| ≤ 40 000 ⇒ |q_i·q_j| ≤ 1.6e9; a partition of 1e8
rows stays < 1.6e17 < 2^62. The final cross-partition reduce sums P
such partials — int64-safe for any realistic layout; callers pushing
beyond that re-chunk partitions, not this operator.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


def covariance_power_sums(df: DataFrame, qcol: str = "q", dim: int = 64) -> DataFrame:
    """Exact integer power sums for the covariance of ``qcol`` (an
    array<bigint> column of length ``dim``): rows

    - ``(i, j, s)`` with ``0 ≤ i ≤ j < dim`` — Σ q_i·q_j (upper
      triangle of XᵀX),
    - ``(i, -1, s)`` — Σ q_i (first moments),
    - ``(-1, -1, n)`` — the row count.

    One Arrow pass, map-only; the caller reduces with
    ``groupBy("i","j").sum("s")`` (the tiny aggregate is included here
    so the result is final)."""
    src = df.select(qcol)

    def partials(batches):
        import pandas as pd

        G = np.zeros((dim, dim), dtype=np.int64)
        s1 = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[qcol].to_numpy()).astype(np.int64)
            if X.shape[1] != dim:
                raise ValueError(
                    f"covariance_power_sums: vector dim {X.shape[1]} != {dim}"
                )
            G += X.T @ X
            s1 += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(dim), [-1]]),
                "j": np.concatenate([ju, np.full(dim, -1), [-1]]),
                "s": np.concatenate([G[iu, ju], s1, [n]]),
            }
        )

    cells = src.mapInPandas(partials, "i int, j int, s long")
    return cells.groupBy("i", "j").agg({"s": "sum"}).withColumnRenamed("sum(s)", "s")


def pca_components(
    sum_rows: list, dim: int, k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Driver-side PCA from the exact power-sum rows (as returned by
    :func:`covariance_power_sums`.collect()): builds the float
    covariance (Σxxᵀ/n − μμᵀ), eigendecomposes, and returns
    (components (k, dim), eigenvalues (k,) descending, n) with a
    deterministic sign convention (each component's
    largest-magnitude entry is positive)."""
    G = np.zeros((dim, dim), dtype=np.float64)
    s1 = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in sum_rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        if i == -1:
            n = s
        elif j == -1:
            s1[i] = s
        else:
            G[i, j] = s
            G[j, i] = s
    if n == 0:
        raise ValueError("pca_components: empty input (no count row)")
    mu = s1 / n
    cov = G / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    return comps, evals[order], n
