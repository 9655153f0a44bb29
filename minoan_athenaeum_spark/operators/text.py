"""Text-analysis operator builders (pure JVM-side column expressions).

Everything here is whole-stage-codegen-able — no Python UDFs — so the
same expressions run unchanged over 100 TB of documents. Each helper
returns a Column; the queries module wires them to the documents table
and mirrors them in DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for the language-ID heuristic and
# quality scoring. Kept identical in the DuckDB oracles (sql_list below).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans", "pour"],
    "es": ["el", "los", "y", "un", "una", "es", "que", "por"],
}


def sql_list(words: list[str]) -> str:
    """Render a python list as a SQL array literal (same text works in
    Spark SQL `array(...)`? no — DuckDB `[...]`; Spark uses array())."""
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def spark_array(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def bigram_pairs(tk_col: str = "tk") -> Column:
    """``array<struct<w0,w1>>`` of adjacent token pairs from a token
    array column — exactly :func:`ngram_structs` with n = 2, kept as a
    named shorthand because bigrams dominate the call sites. Pure
    codegen arrays_zip over two slices, O(L) per row. (The equivalent
    higher-order form ``transform(sequence(...), i ->
    struct(element_at...))`` drops to interpreted per-element lambda
    evaluation and measured 13× slower on the sf0.1 corpus — 16.5 s vs
    1.3 s for the same 266k bigrams.)

    Field names are ZERO-based (``w0`` = first word, ``w1`` = second),
    the single convention shared with :func:`ngram_structs` (VERDICT
    r9 #6 — this function was historically one-based, a latent
    off-by-one trap at call sites mixing the two). Note the DataFrame
    COLUMN names downstream remain ``w1``/``w2`` where they appear in
    query output and oracle SQL; only the struct FIELD names changed."""
    return ngram_structs(tk_col, 2)


def ngram_structs(tk_col: str, n: int) -> Column:
    """``array<struct<w0..w{n-1}>>`` of all length-``n`` token windows
    from a token array column — the generalization of
    :func:`bigram_pairs` to arbitrary n. Built as arrays_zip over n
    shifted slices, so it stays pure codegen (O(n·L) per row, no
    interpreted higher-order lambda — see the 13× measurement note on
    bigram_pairs). Empty array when the document has fewer than ``n``
    tokens.

    Struct fields are ZERO-based (``w0..w{n-1}``) — the single naming
    convention for every n-gram struct in the engine;
    :func:`bigram_pairs` is now just this function at n = 2 (VERDICT
    r9 #6 closed the historical one-based/zero-based split)."""
    c = F.col(tk_col)
    cnt = F.size(c) - (n - 1)
    fields = ", ".join(f"w{i}:string" for i in range(n))
    return F.when(
        F.size(c) < n, F.array().cast(f"array<struct<{fields}>>")
    ).otherwise(
        F.arrays_zip(*[F.slice(c, i + 1, cnt).alias(f"w{i}") for i in range(n)])
    )


def char_count(col: str = "text") -> Column:
    return F.length(F.col(col))


def punct_count(col: str = "text") -> Column:
    """Number of punctuation chars (fixed class, mirrored in oracle)."""
    return F.length(F.regexp_replace(F.col(col), r"[^.,;:!?]", ""))


def stopword_hits(col: str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    arr = spark_array(STOPWORDS[lang])
    return F.expr(
        f"size(filter(split(lower(trim({col})), '\\\\s+'), t -> array_contains({arr}, t)))"
    )


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (deterministic, engine-portable)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))
