from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.sources.delimited import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = os.path.join(str(tmp_path), "nation_csv")
    write_csv(nation, path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    supplier = load_table(spark, sf_dir, "supplier")
    path = os.path.join(str(tmp_path), "supplier_jsonl")
    write_jsonl(supplier, path)
    back = read_jsonl(spark, path, supplier.schema)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in supplier.collect()
    }
    # And it's queryable like any table.
    assert (
        back.filter(F.col("s_acctbal") > 0).count()
        == supplier.filter(F.col("s_acctbal") > 0).count()
    )
