"""Reader for the reference's ``<name>.table.json`` format (SURVEY §2 S1).

Format (public spec, /root/reference/README.md "Table JSON"): a JSON
array whose first element is a header of ``[column_name, "str"|"int"]``
pairs; remaining elements are row arrays. Two types only; no nulls.

The reference eagerly builds columnar stores + inverted indexes per
column (/root/reference/database.py:905-996); in Spark the DataFrame,
Tungsten columnar batches and join hash tables subsume those structures,
so this reader just produces a typed DataFrame. Small files load via
the driver (they are CLI-parity fixtures); a scale path would convert
to parquet once and scan that.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from minoan_athenaeum_spark.plans.dialect import DialectError

_TYPE_MAP = {"int": T.LongType(), "str": T.StringType()}


def load_table_json(
    spark: SparkSession, path: str, name: str | None = None
) -> tuple[DataFrame, int]:
    """Load one .table.json file → (DataFrame, row_count)."""
    name = name or os.path.basename(path).replace(".table.json", "")
    try:
        with open(path) as f:
            payload = json.load(f)
    except (OSError, json.JSONDecodeError):
        raise DialectError(f'Unable to read table "{os.path.basename(path)}" from disk')
    if not isinstance(payload, list) or not payload or not isinstance(payload[0], list):
        raise DialectError(f'There was no header row defined for table "{name}"')
    header = payload[0]
    fields = []
    for coldef in header:
        if (
            not isinstance(coldef, list)
            or len(coldef) != 2
            or coldef[1] not in _TYPE_MAP
        ):
            bad = (
                coldef[1]
                if isinstance(coldef, list) and len(coldef) > 1
                else coldef
            )
            raise DialectError(f'Invalid column type "{bad}" in table "{name}"')
        fields.append(T.StructField(coldef[0], _TYPE_MAP[coldef[1]], nullable=False))
    schema = T.StructType(fields)
    rows = payload[1:]
    df = spark.createDataFrame(rows, schema=schema)
    return df, len(rows)


def resolve_table_path(tables_dir: str, table_name: str) -> str:
    return os.path.join(tables_dir, f"{table_name}.table.json")
