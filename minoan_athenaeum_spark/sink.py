"""CLI-parity result sink (SURVEY §2 S3).

Formats a collected result the way the reference prints it
(observable spec = the golden ``.out`` files, e.g.
/root/reference/example-1.out):

  - columns separated by `` | ``
  - a dash underline spanning the full header line
  - column width = max(header width, widest value)
  - strings left-aligned, ints right-aligned

DataFrame-level correctness never depends on this module — it is a thin
presentation layer over ``collect()`` for small CLI results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def format_results(df: DataFrame) -> str:
    cols = df.columns
    is_int = [
        isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
        for f in df.schema.fields
    ]
    rows = [[("" if v is None else str(v)) for v in row] for row in df.collect()]
    widths = [
        max(len(cols[i]), *(len(r[i]) for r in rows)) if rows else len(cols[i])
        for i in range(len(cols))
    ]
    # The reference pads every cell — including the last column — to the
    # full column width and never strips trailing pad (example-3.out:2 is
    # `"name        | smaller_city "` with a trailing space), so neither
    # the header nor the data rows are rstripped here.
    header = " | ".join(c.ljust(widths[i]) for i, c in enumerate(cols))
    # Underline spans the full (unstripped) header width.
    total = sum(widths) + 3 * (len(widths) - 1)
    lines = [header, "-" * total]
    for r in rows:
        cells = [
            (r[i].rjust(widths[i]) if is_int[i] else r[i].ljust(widths[i]))
            for i in range(len(cols))
        ]
        lines.append(" | ".join(cells))
    return "\n".join(lines)
