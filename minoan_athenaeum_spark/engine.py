"""High-level engine facade — the library surface a reference user
switches to.

    from minoan_athenaeum_spark.engine import Athenaeum

    eng = Athenaeum.local()
    eng.register_table_json_dir("/root/reference")       # reference catalog
    eng.sql_strict('SELECT name, population FROM cities '
                   'WHERE country = "Japan" AND population > 8000')  # dialect
    eng.register_parquet_dir("/root/testdata/sf0.01")    # modern catalog
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")  # ANSI

Two query paths:
  - ``sql_strict``: the reference dialect with its exact error semantics
    (SURVEY §2 T1/T2/E2-E6) — parsed/validated by plans/, executed as
    DataFrame ops.
  - ``sql``: full Spark SQL (Catalyst) over the same registered tables —
    the widened engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from minoan_athenaeum_spark.plans.dialect import parse
from minoan_athenaeum_spark.plans.executor import Executor, check_duplicate_aliases
from minoan_athenaeum_spark.session import get_spark
from minoan_athenaeum_spark.sink import format_results
from minoan_athenaeum_spark.sources.table_json import load_table_json


class Athenaeum:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, **kwargs) -> "Athenaeum":
        return cls(get_spark(**kwargs))

    # ------------------------------------------------------------ catalog

    def register(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    def register_parquet_dir(self, path: str) -> list[str]:
        """Register every ``<name>.parquet`` under ``path`` (lazy scans)."""
        names = []
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".parquet"):
                name = fn[: -len(".parquet")]
                from minoan_athenaeum_spark.catalog import load_table

                self.register(name, load_table(self.spark, path, name))
                names.append(name)
        return names

    def register_table_json_dir(self, path: str) -> list[str]:
        """Register every ``<name>.table.json`` under ``path`` (the
        reference's file-as-catalog layout, SURVEY §1.3)."""
        names = []
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".table.json"):
                name = fn[: -len(".table.json")]
                df, _ = load_table_json(self.spark, os.path.join(path, fn), name)
                self.register(name, df)
                names.append(name)
        return names

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    # ------------------------------------------------------------ queries

    def sql(self, query: str) -> DataFrame:
        """Full ANSI Spark SQL over the registered tables."""
        return self.spark.sql(query)

    def sql_strict(self, query: str) -> DataFrame:
        """Reference-dialect SQL with reference error semantics."""
        q = parse(query)
        check_duplicate_aliases(q)
        missing = [t.name for t in q.tables if t.name not in self._tables]
        if missing:
            from minoan_athenaeum_spark.plans.dialect import DialectError

            raise DialectError(
                f'Unable to read table "{missing[0]}.table.json" from disk'
            )
        tables = {t.effective_name: self._tables[t.name] for t in q.tables}
        return Executor(tables).plan(q)

    def show(self, df: DataFrame) -> str:
        """Reference-format text rendering (S3 sink)."""
        return format_results(df)
