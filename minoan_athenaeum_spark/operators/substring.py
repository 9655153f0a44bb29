"""Exact substring-level deduplication: find every maximal token run
that appears (verbatim) more than once across a corpus.

This is the operator behind "Deduplicating Training Data Makes Language
Models Better" (Lee et al., ACL 2022): document-level dedup misses the
boilerplate CASE — two distinct pages sharing a 300-token licence
block — so training pipelines additionally remove any *substring* of at
least L tokens that occurs >= 2 times in the corpus.

Algorithm (all relational — no suffix automaton on the driver):

1. postings:   every length-L token window of every document, hashed to
               a bigint at creation (xxhash64 of the space-joined gram)
               so the shuffle moves (hash, doc, pos) — the gram TEXT
               never enters an exchange.
2. duplicated: group postings by gram hash, keep hashes with count>=2
               (map-side partial aggregation collapses repeats before
               the shuffle; the result is one narrow row per
               duplicated gram).
3. marked:     semi-join postings against the duplicated set (hash-hash
               join on the 8-byte key; AQE may broadcast when the
               duplicated set is small).
4. spans:      per-document gaps-and-islands over marked start
               positions: two overlapping or back-to-back runs
               ([p, p+L-1] and [q, q+L-1] with q-p <= L) merge into
               one maximal span. The window is PARTITIONED BY doc —
               per-doc row counts are bounded by doc length, so no
               global-window single-partition hazard.

At 100 TB: one narrow shuffle on gram hashes (8-byte keys + two ints),
one join on the same key, one per-doc window. A hot gram (a phrase
repeated a million times) produces ONE duplicated-set row — the
count>=2 filter happens in the aggregate, so no reducer ever sees a
posting list; the marked join fans out only to the actual occurrences,
which is output-sized work.

Reference parity note: the reference engine (icirellik/minoan-athenaeum,
database.py) has no text operators at all — this is extension surface,
like the rest of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_grams(tokens: Column, length: int) -> Column:
    """Array of (0-based start pos, space-joined L-token gram) structs
    for every length-L window of a token array (JVM transform, no UDF)."""
    # NB: F.sequence(1, 0) DESCENDS ([1, 0]) rather than yielding an
    # empty array, so docs shorter than ``length`` need an explicit
    # empty-result guard.
    return F.when(
        F.size(tokens) < length, F.array().cast("array<struct<pos:bigint,gram:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (length - 1)),
            lambda i: F.struct(
                (i - 1).cast("bigint").alias("pos"),
                F.array_join(F.slice(tokens, i, length), " ").alias("gram"),
            ),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tk",
    length: int = 20,
) -> DataFrame:
    """Maximal duplicated token spans of >= ``length`` tokens.

    ``docs`` must carry a unique ``id_col`` and an array<string>
    ``tokens_col``. Returns one row per maximal span:
    (id, span_start, span_end, span_len, span_md5) where positions are
    0-based token indices, span_end inclusive, and span_md5 pins the
    exact duplicated text (md5 of the space-joined token slice).

    A gram counts as duplicated when it occurs >= 2 times anywhere —
    across documents or twice within one (Lee et al. remove both).
    """
    postings = docs.select(
        F.col(id_col),
        F.explode(token_grams(F.col(tokens_col), length)).alias("g"),
    ).select(
        id_col,
        F.col("g.pos").alias("pos"),
        F.xxhash64(F.col("g.gram")).alias("gh"),
    )

    duplicated = (
        postings.groupBy("gh").count().filter(F.col("count") >= 2).select("gh")
    )

    marked = postings.join(duplicated, "gh").select(id_col, "pos")

    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        marked.withColumn(
            "brk",
            F.when(
                F.col("pos") - F.lag("pos").over(w) <= length, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "grp",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (length - 1)).alias("span_end"),
        )
        .drop("grp")
    )

    return (
        islands.join(docs.select(id_col, tokens_col), id_col)
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col(tokens_col),
                        (F.col("span_start") + 1).cast("int"),
                        (F.col("span_end") - F.col("span_start") + 1).cast(
                            "int"
                        ),
                    ),
                    " ",
                )
            ).alias("span_md5"),
        )
    )
