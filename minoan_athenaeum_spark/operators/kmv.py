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
