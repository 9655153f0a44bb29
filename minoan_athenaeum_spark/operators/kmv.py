"""KMV (k-minimum-values / bottom-k) sketch partials — Bar-Yossef et
al., RANDOM 2002.

The KMV estimator needs the k smallest DISTINCT hash values of a
column. The naive plan computes `distinct()` first — a corpus-wide
shuffle whose cost scales with GLOBAL distinct cardinality (measured
262 s at 1024× / 340M distinct keys), which defeats the point of a
constant-size sketch. The scale-correct plan never deduplicates the
corpus:

1. per partition (and per group), keep a running set of the k smallest
   distinct hashes — constant memory, one sequential Arrow scan,
   map-only. Duplicates collapse locally; nothing shuffles.
2. the union of per-partition partials (≤ k·P·|groups| tiny rows) is a
   guaranteed superset of every group's true bottom-k AND of the
   global bottom-k: a hash among a group's k smallest distinct values
   has < k smaller distinct values in that group, hence < k in any
   single partition of it, so every partition that saw it kept it.
3. exact distinct/sort/limit over the candidate set only — candidate-
   sized work, independent of corpus rows and of global cardinality.

Per-batch cost is O(batch log batch + k) via np.unique (C speed), not
per-row Python — the same batch-reduction discipline as
operators/heavyhitters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmv_partition_partials(
    df: DataFrame, group_col: str, hash_col: str, k: int
) -> DataFrame:
    """Per-partition, per-group k smallest DISTINCT values of
    ``hash_col`` (a bigint). Output columns: (``g`` string, ``hv``
    long), ≤ k·|groups| rows per partition. Candidates may repeat
    across partitions — downstream takes its own distinct over the
    (tiny) candidate set."""
    src = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(hash_col).cast("bigint").alias("hv"),
    )

    def partials(batches):
        import numpy as np
        import pandas as pd

        best: dict = {}
        for pdf in batches:
            for g, grp in pdf.groupby("g", sort=False):
                arr = grp["hv"].to_numpy(dtype="int64")
                cur = best.get(g)
                merged = np.unique(
                    arr if cur is None else np.concatenate([cur, arr])
                )
                best[g] = merged[:k]
        if best:
            yield pd.DataFrame(
                {
                    "g": [g for g, a in best.items() for _ in range(len(a))],
                    "hv": np.concatenate(list(best.values())),
                }
            )

    return src.mapInPandas(partials, "g string, hv long")


def kmv_candidates_jvm(
    df: DataFrame,
    group_col: str,
    hash_col: str,
    k: int,
    scale_bits: int = 60,
    margin: int = 4,
    max_rounds: int = 4,
) -> DataFrame:
    """EXACT bottom-k candidate set via a JVM-only sketch-then-verify
    prefilter — the fast path over :func:`kmv_partition_partials`'s
    Arrow scan (measured 162 s for 614M rows; this path is a codegen
    scan + filter).

    Hashes are ~uniform on [0, 2^scale_bits), so a group with D
    distinct hashes has its k-th smallest near k·2^scale_bits/D.
    Phase 1 estimates D per group (approx_count_distinct, one JVM
    pass), sets threshold t_g = margin·k·2^scale_bits/D_est, and keeps
    rows with hv < t_g — map-side, pushdown-friendly, expected
    margin·k rows per group surviving REGARDLESS of corpus size.
    Phase 2 dedups the survivors (map-side partial combine, so a hot
    duplicated hash never floods the shuffle) and VERIFIES
    sufficiency: a group's k smallest distinct hashes are all below
    t_g iff ≥ k distinct survivors exist (or t_g covers the full hash
    range, which also means every distinct value survived). Groups
    that fail (estimate off by > margin) get the threshold widened
    ×8 and re-filtered; after ``max_rounds`` the threshold is the full
    range — unconditionally exact. Returns the DISTINCT survivor
    (``g``, ``hv``) rows: a verified superset of every group's true
    bottom-k distinct hashes (and hence of the global bottom-k).

    Bounds: the per-group thresholds live in a driver-built CASE
    expression, so ``group_col`` must have BOUNDED cardinality (sketch
    group labels, ≲ a few thousand) — for unbounded group sets use
    :func:`kmv_partition_partials`, whose state is per-executor. Null
    group values are dropped (a null never matches the CASE arms). A
    widen round re-filters every group (one extra corpus scan), but
    with approx_count_distinct's ~2% error a ×``margin`` shortfall is
    vanishingly rare.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    full = 1 << scale_bits
    short: list[str] = []
    src = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(hash_col).cast("bigint").alias("hv"),
    )
    est = {
        r["g"]: max(int(r["d"]), 1)
        for r in src.groupBy("g")
        .agg(F.approx_count_distinct("hv").alias("d"))
        .collect()
    }
    thresholds = {
        g: min(full, max(1, (margin * k * full) // d)) for g, d in est.items()
    }
    for _ in range(max_rounds):
        t_expr = F.coalesce(
            *[
                F.when(F.col("g") == g, F.lit(t))
                for g, t in thresholds.items()
            ]
        ) if thresholds else F.lit(full)
        survivors = (
            src.withColumn("_t", t_expr)
            .where(F.col("hv") < F.col("_t"))
            .select("g", "hv")
            .dropDuplicates(["g", "hv"])
            .localCheckpoint(eager=True)
        )
        counts = {
            r["g"]: int(r["n"])
            for r in survivors.groupBy("g").agg(F.count("*").alias("n")).collect()
        }
        short = [
            g
            for g, t in thresholds.items()
            if t < full and counts.get(g, 0) < k
        ]
        if not short:
            return survivors
        for g in short:
            thresholds[g] = min(full, thresholds[g] * 8)
    # max_rounds exhausted: force full range for the stragglers (exact)
    for g in short:
        thresholds[g] = full
    t_expr = F.coalesce(
        *[F.when(F.col("g") == g, F.lit(t)) for g, t in thresholds.items()]
    )
    return (
        src.withColumn("_t", t_expr)
        .where(F.col("hv") < F.col("_t"))
        .select("g", "hv")
        .dropDuplicates(["g", "hv"])
        .localCheckpoint(eager=True)
    )
