"""Arrow-vectorized scalar pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves the Series type hints at definition time, and
stringified annotations with locally-imported names break that.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def py_token_count(s: pd.Series) -> pd.Series:
    """Whitespace token count, computed in Python (vectorized str ops
    over Arrow batches)."""
    return s.str.strip().str.split().str.len().astype("int64")


@pandas_udf("long")
def py_len_bucket(s: pd.Series) -> pd.Series:
    return (s.str.len() % 101).astype("int64")
