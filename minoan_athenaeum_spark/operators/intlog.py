"""Exact fixed-point integer log2 — the cross-engine-portable log.

Log-domain scoring (perplexity, log-likelihood) normally can't be
oracle-gated bit-exactly: ``ln``/``log2`` are transcendental, and two
libm implementations (JVM vs DuckDB's C++ stdlib) may disagree in the
last ulp, which a Σ over millions of terms amplifies into different
orderings. This module sidesteps libm entirely: ``L(x)`` is a QUANTIZED
log2 defined by a finite integer recurrence —

1. normalize ``x`` into y ∈ [2^30, 2^31) by conditional CONSTANT
   shifts (binary-search the msb; truncation of low bits during
   right-shifts is part of the definition), tracking the exponent m
   with x ≈ y·2^m;
2. extract ``frac_bits`` fraction bits by squaring: q = (y·y) >> 30;
   bit = [q ≥ 2^31]; y = q >> bit (the classic shift-and-square log);
3. L(x) = ((m + 30) << frac_bits) | f  — log2(x) in Qfrac_bits.

Every step is an int64 comparison/shift/multiply, so ANY engine
evaluates L identically — there is nothing to tolerate-gate. The
quantization (2^-24 by default, plus ≤ ~25·2^-30 truncation error) is
part of the operator contract, far below any corpus-ranking signal.

Four synchronized implementations (pinned against each other and
against math.log2 in tests/test_intlog.py):
- :func:`log2_fixed_int` — pure-Python ints (reference + driver scalars)
- :func:`with_log2_fixed` — Spark DataFrame transform; each step is a
  NAMED projection column so Catalyst never inlines the recurrence
  into an exponentially-duplicated expression tree
- :func:`log2_fixed_pandas` — Arrow-vectorized numpy twin for SMALL
  model tables, where the JVM form's ~110-projection plan costs more
  in py4j/analysis/codegen than the rows cost to compute
- :func:`log2_lookup_cte` — DuckDB SQL text generator (chained CTEs)
  for the oracle twin

Domain: x ≥ 1 (int64). L(1) = 0 exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 30  # normalization fixed-point: y in [2^Q, 2^(Q+1))
_DOWN = (32, 16, 8, 4, 2, 1)  # msb binary search, x up to 2^63
_UP = (16, 8, 4, 2, 1)  # lift small x (min total shift 31 > Q)


def log2_fixed_int(x: int, frac_bits: int = 24) -> int:
    """Pure-Python reference: quantized log2 of ``x`` ≥ 1 in Qfrac_bits."""
    if x < 1:
        raise ValueError(f"log2_fixed_int domain is x >= 1, got {x}")
    y, m = x, 0
    for s in _DOWN:
        if y >= 1 << (Q + s):
            y >>= s
            m += s
    for s in _UP:
        if y < 1 << (Q + 1 - s):
            y <<= s
            m -= s
    f = 0
    for _ in range(frac_bits):
        q = (y * y) >> Q
        if q >= 1 << (Q + 1):
            f = f * 2 + 1
            y = q >> 1
        else:
            f = f * 2
            y = q
    return ((m + Q) << frac_bits) + f


def with_log2_fixed(
    df: DataFrame, x_col: str, out_col: str, frac_bits: int = 24
) -> DataFrame:
    """Append ``out_col`` = L(``x_col``) (quantized log2, Qfrac_bits).

    Each recurrence step lands in its own named column (Catalyst's
    CollapseProject keeps multiply-referenced non-cheap expressions as
    separate projections, so the plan stays linear in ``frac_bits``
    rather than exponentially duplicated). All steps are int64
    codegen expressions — apply to DISTINCT-key count tables, not the
    instance stream, and the cost is per distinct value.

    Domain: ``x_col`` ≥ 1, same as :func:`log2_fixed_int`. The
    recurrence is only defined there, so a row with x < 1 raises at
    execution time (one cheap guard branch per row — a caller that
    forgets the +1 offset on a count fails loudly instead of getting
    plausible-but-wrong scores like L(0) = -2^24).
    """
    y, m = "_il_y", "_il_m"
    d = df.withColumn(
        y,
        F.when(
            F.col(x_col) < 1,
            F.raise_error(
                F.format_string(
                    "log2_fixed domain is x >= 1, got %s",
                    F.col(x_col).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.col(x_col))
        .cast("long"),
    ).withColumn(m, F.lit(0).cast("long"))
    for s in _DOWN:
        hit = F.col(y) >= F.lit(1 << (Q + s)).cast("long")
        d = d.withColumn(
            "_il_t", F.when(hit, F.shiftright(F.col(y), s)).otherwise(F.col(y))
        )
        d = d.withColumn(m, F.when(hit, F.col(m) + s).otherwise(F.col(m)))
        d = d.withColumn(y, F.col("_il_t"))
    for s in _UP:
        hit = F.col(y) < F.lit(1 << (Q + 1 - s)).cast("long")
        d = d.withColumn(
            "_il_t", F.when(hit, F.shiftleft(F.col(y), s)).otherwise(F.col(y))
        )
        d = d.withColumn(m, F.when(hit, F.col(m) - s).otherwise(F.col(m)))
        d = d.withColumn(y, F.col("_il_t"))
    d = d.withColumn("_il_f", F.lit(0).cast("long"))
    for _ in range(frac_bits):
        d = d.withColumn("_il_q", F.shiftright(F.col(y) * F.col(y), Q))
        hi = F.col("_il_q") >= F.lit(1 << (Q + 1)).cast("long")
        d = d.withColumn(
            "_il_f",
            F.col("_il_f") * 2 + F.when(hi, F.lit(1)).otherwise(F.lit(0)),
        )
        d = d.withColumn(
            y, F.when(hi, F.shiftright(F.col("_il_q"), 1)).otherwise(F.col("_il_q"))
        )
    d = d.withColumn(
        out_col,
        (F.shiftleft(F.col(m) + Q, frac_bits) + F.col("_il_f")).cast("long"),
    )
    return d.drop(y, m, "_il_t", "_il_f", "_il_q")


def log2_fixed_pandas(frac_bits: int = 24):
    """Arrow-vectorized twin of :func:`log2_fixed_int`: a ``long →
    long`` pandas_udf for applying the recurrence to SMALL model
    tables (distinct-value lookups of ≤ a few thousand rows, e.g. the
    dsir bucket fit). The JVM form's plan carries ~110 named
    projections whose construction + analysis + codegen cost seconds
    per query; for a bounded model table the numpy loop is exact and
    effectively free. Same integer recurrence in int64 (y < 2^31 so
    y·y < 2^62 — no overflow); bit-identity with the other forms is
    pinned in tests/test_intlog.py."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _log2_fixed(x: pd.Series) -> pd.Series:
        y = x.to_numpy(dtype=np.int64, copy=True)
        if y.size and int(y.min()) < 1:
            raise ValueError(
                f"log2_fixed domain is x >= 1, got {int(y.min())}"
            )
        m = np.zeros_like(y)
        for s in _DOWN:
            hit = y >= (np.int64(1) << (Q + s))
            y = np.where(hit, y >> s, y)
            m = np.where(hit, m + s, m)
        for s in _UP:
            hit = y < (np.int64(1) << (Q + 1 - s))
            y = np.where(hit, y << s, y)
            m = np.where(hit, m - s, m)
        f = np.zeros_like(y)
        for _ in range(frac_bits):
            q = (y * y) >> Q
            hi = q >= (np.int64(1) << (Q + 1))
            f = f * 2 + hi.astype(np.int64)
            y = np.where(hi, q >> 1, q)
        return pd.Series(((m + Q) << frac_bits) + f)

    return _log2_fixed


def log2_lookup_cte(vals_cte: str, out_cte: str, frac_bits: int = 24) -> str:
    """DuckDB CTE-chain text mapping each row of ``vals_cte`` (one
    BIGINT column ``x`` ≥ 1) to ``out_cte(x, lg)`` — the SAME integer
    recurrence as :func:`log2_fixed_int`, step for step, so the oracle
    reproduces the engine's quantized logs bit-exactly. Embed the
    returned text inside an existing WITH list (it starts with a CTE
    name, no leading WITH, no trailing comma)."""
    p = out_cte
    parts = [
        f"{p}_0 AS (SELECT x, CAST(x AS BIGINT) AS y,"
        f" CAST(0 AS BIGINT) AS m FROM {vals_cte})"
    ]
    step = 0
    for s in _DOWN:
        thr = 1 << (Q + s)
        nxt = step + 1
        parts.append(
            f"{p}_{nxt} AS (SELECT x,"
            f" CASE WHEN y >= {thr} THEN y >> {s} ELSE y END AS y,"
            f" m + CASE WHEN y >= {thr} THEN {s} ELSE 0 END AS m"
            f" FROM {p}_{step})"
        )
        step = nxt
    for s in _UP:
        thr = 1 << (Q + 1 - s)
        nxt = step + 1
        parts.append(
            f"{p}_{nxt} AS (SELECT x,"
            f" CASE WHEN y < {thr} THEN y << {s} ELSE y END AS y,"
            f" m - CASE WHEN y < {thr} THEN {s} ELSE 0 END AS m"
            f" FROM {p}_{step})"
        )
        step = nxt
    nxt = step + 1
    parts.append(
        f"{p}_{nxt} AS (SELECT x, y, m, CAST(0 AS BIGINT) AS f FROM {p}_{step})"
    )
    step = nxt
    hi = 1 << (Q + 1)
    for _ in range(frac_bits):
        nxt = step + 1
        parts.append(
            f"{p}_{nxt} AS (SELECT x, m,"
            f" CASE WHEN q >= {hi} THEN q >> 1 ELSE q END AS y,"
            f" f * 2 + CASE WHEN q >= {hi} THEN 1 ELSE 0 END AS f"
            f" FROM (SELECT x, m, (y * y) >> {Q} AS q, f FROM {p}_{step}))"
        )
        step = nxt
    parts.append(
        f"{p} AS (SELECT x,"
        f" ((m + {Q}) << {frac_bits}) + f AS lg FROM {p}_{step})"
    )
    return ",\n    ".join(parts)
