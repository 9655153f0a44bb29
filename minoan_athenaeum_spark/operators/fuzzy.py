"""Fuzzy (edit-distance) self-join via FastSS deletion neighborhoods.

"Find all pairs within edit distance k" is a join Spark has no
primitive for, and the naive answer is an O(n²) cross join with
levenshtein() — a non-starter beyond toy sizes. FastSS (Bocek et al.,
2007) turns it into an equi-join: two strings are within edit
distance 1 iff their 0-or-1-deletion neighborhoods intersect
(substitution at position i ⇒ deleting i from both yields the same
string; insertion/deletion ⇒ one string is in the other's deletion
set; equality ⇒ the strings themselves match). So:

1. explode each string into its ≤ len+2 neighborhood variants
   (itself + every single-char deletion) — map-side, output O(n·L);
2. hash-equi-join on the variant (one shuffle on variant hashes —
   the candidate set, a provable superset of all dist≤1 pairs);
3. verify candidates with the built-in levenshtein (JVM codegen) and
   dedupe.

A hot variant (many strings sharing a deletion) fans out only to its
true candidate pairs — output-sized work, same argument as the LSH
band joins. Exact-by-construction: the verify step makes the result
equal to the brute-force definition, which is what the DuckDB oracle
computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(col: F.Column) -> F.Column:
    """The string plus every single-character deletion (distinct)."""
    return F.array_distinct(
        F.concat(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, 1, (i - 1).cast("int")),
                    col.substr(i + 1, F.length(col)),
                ),
            ),
        )
    )


def fuzzy_self_join_dist1(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """All pairs (a < b by ``id_col``) with levenshtein distance <= 1
    (including exact duplicates at distance 0). Returns (a, b, dist)."""
    nb = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.explode(deletion_neighborhood(F.col(str_col))).alias("_v"),
    ).select("_id", "_s", F.xxhash64("_v").alias("_vh"))

    left = nb.select(
        F.col("_id").alias("a"), F.col("_s").alias("sa"), "_vh"
    )
    right = nb.select(
        F.col("_id").alias("b"), F.col("_s").alias("sb"), "_vh"
    )
    cand = (
        left.join(right, "_vh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= 1)
        .select("a", "b", "dist")
    )
