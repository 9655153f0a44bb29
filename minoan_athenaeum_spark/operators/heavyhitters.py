"""Heavy hitters (frequent items) via per-partition Misra-Gries
summaries + an exact verification pass.

The one-pass exact answer to "which items occur more than n/k times"
needs a full groupBy over every item — at 100 TB that shuffle is the
cost. The classic fix is a MERGEABLE sketch pass first:

1. per partition, a Misra-Gries summary with k counters (constant
   memory, one sequential scan — the canonical streaming frequent-items
   algorithm). MG(k)'s guarantee: any item with partition frequency
   > n_p/(k+1) is present in the summary.
2. union of the per-partition candidate sets (≤ k·P tiny rows). If an
   item has GLOBAL frequency > n/(k+1) it must exceed n_p/(k+1) in at
   least one partition (else summing the per-partition bounds gives
   freq ≤ n/(k+1)) — so the union is a guaranteed superset of the
   global heavy hitters.
3. exact re-count of ONLY the candidates: broadcast the candidate set,
   hash-semi-join the stream against it, groupBy the survivors. The
   big shuffle now moves only rows whose key is a candidate — output-
   sized, not input-sized.

Because step 3 is exact, the final result is DETERMINISTIC — identical
for every partitioning and batch order — even though step 1 is a
sketch. That is what lets the heavy-hitters query carry a plain SQL
oracle (GROUP BY ... HAVING cnt*k > n).

Batch processing inside each partition uses the weighted-decrement
reduction (Agarwal et al., "Mergeable Summaries", PODS 2012): add the
batch's value_counts (vectorized, C speed), then if more than k
counters remain, subtract the (k+1)-th largest count from all and drop
the non-positive — equivalent to running per-item MG, but per-batch
cost is O(batch + k log k) instead of per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict, k: int) -> dict:
    """Keep at most k counters by subtracting the (k+1)-th largest
    count from all (the weighted Misra-Gries decrement)."""
    if len(counters) <= k:
        return counters
    vals = sorted(counters.values(), reverse=True)
    cut = vals[k]  # (k+1)-th largest
    return {key: c - cut for key, c in counters.items() if c - cut > 0}


def misra_gries_candidates(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Distinct candidate keys from per-partition Misra-Gries(k)
    summaries — a guaranteed superset of every key with global
    frequency > n/(k+1). One narrow output row per surviving counter
    per partition (≤ k·P rows total)."""
    src = df.select(F.col(key_col).cast("string").alias("key"))

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf["key"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            counters = _mg_reduce(counters, k)
        yield pd.DataFrame({"key": list(counters.keys())})

    return src.mapInPandas(summarize, "key string").distinct()


def heavy_hitters(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Exact keys (and counts) occurring MORE than n/k times, computed
    with the sketch-then-verify plan above. Returns (key, cnt); the
    comparison is integer-exact (cnt·k > n — no float division)."""
    src = df.select(F.col(key_col).cast("string").alias("key"))
    candidates = misra_gries_candidates(df, key_col, k)
    total = src.agg(F.count("*").alias("n"))
    return (
        src.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select("key", "cnt")
    )
