"""Parquet catalog over the driver testdata directories.

The reference resolves ``<name>.table.json`` files relative to CWD as its
catalog (``/root/reference/database.py:905-996``); ours is a directory of
parquet files registered as temp views. Loading is lazy (Spark scans) —
no eager materialization, so the same code handles 100 TB directories.

Special case: ``events.parquet``'s ``ts`` column. Some driver rounds
generate it as parquet TIMESTAMP(NANOS), which Spark's parquet reader
rejects (PARQUET_TYPE_ILLEGAL); others as TIMESTAMP(MICROS), which
Spark reads natively. The unit is detected from the parquet footer per
sf_dir (NOT assumed — round 4's testdata silently switched ns → µs and
the hardcoded ns workaround divided every microsecond timestamp by
1000). For ns we read the physical INT64 with an explicit schema and
convert ns → a microsecond TIMESTAMP column (session tz is UTC, so
values agree with DuckDB's naive TIMESTAMP_NS truncated to µs).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Physical read schema for events: ts as raw int64 nanoseconds.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# Native read schema for events when ts is already a µs/ms timestamp
# (file streams require an explicit schema, so both variants are here).
EVENTS_NATIVE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_EVENTS_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Timestamp unit of ``events.parquet``'s ``ts`` column ('ns', 'us',
    'ms', 's'), read from the parquet footer of one part file. 'ns'
    needs the raw-INT64 workaround; everything else reads natively.
    Cached per sf_dir — the footer read is a driver-side one-off."""
    unit = _EVENTS_TS_UNIT_CACHE.get(sf_dir)
    if unit is None:
        import glob
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(path):
            parts = sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
            if not parts:
                raise FileNotFoundError(f"no parquet part files under {path}")
            path = parts[0]
        pf = pq.ParquetFile(path)
        # Legacy INT96 timestamps carry no unit annotation — pyarrow
        # surfaces them as timestamp[ns], which would mis-route them to
        # the raw-int64 reader. Detect the physical type and let Spark's
        # native INT96 path read them instead.
        pschema = pf.schema
        ts_idx = next(
            i for i in range(len(pschema)) if pschema.column(i).name == "ts"
        )
        if pschema.column(ts_idx).physical_type == "INT96":
            _EVENTS_TS_UNIT_CACHE[sf_dir] = "int96"
            return "int96"
        field = pf.schema_arrow.field("ts")
        if not pa.types.is_timestamp(field.type):
            raise TypeError(
                f"events.ts is {field.type}, expected a parquet timestamp"
            )
        unit = field.type.unit
        _EVENTS_TS_UNIT_CACHE[sf_dir] = unit
    return unit


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    unit = events_ts_unit(sf_dir)
    if unit == "int96":
        # Spark reads legacy INT96 into a native TimestampType itself;
        # forcing a schema would fight the vectorized reader.
        return spark.read.parquet(f"{sf_dir}/events.parquet")
    if unit == "ns":
        raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(
            f"{sf_dir}/events.parquet"
        )
        # Integer division — float division loses µs precision on
        # 19-digit ns.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(EVENTS_NATIVE_SCHEMA).parquet(
        f"{sf_dir}/events.parquet"
    )


# Per-session handle cache: re-creating a DataFrame re-reads parquet
# footers and re-lists files; reusing the analyzed relation skips that
# (plans are immutable, so sharing is safe). Weak-keyed on the
# SparkSession itself so a stopped, garbage-collected session's entries
# vanish with it — no id()-reuse hazard, no unbounded growth.
_HANDLE_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _use_bucketed_facts() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_BUCKETED_FACTS", "") not in ("", "0")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _HANDLE_CACHE.get(spark)
    if per_session is None:
        per_session = {}
        _HANDLE_CACHE[spark] = per_session
    # Opt-in pre-bucketed fact layout: when SPARK_GRAFT_BUCKETED_FACTS
    # is set and sources.bucketed.ensure_bucketed_facts has materialized
    # this table for this sf_dir, serve the managed bucketed table —
    # same rows and schema, but hash-bucketed + sorted on orderkey, so
    # every orderkey join/aggregate downstream skips its Exchange.
    if _use_bucketed_facts() and name in ("lineitem", "orders"):
        df = per_session.get((sf_dir, name, True))
        if df is None:
            from minoan_athenaeum_spark.sources.bucketed import (
                bucketed_fact_table_name,
            )

            table = bucketed_fact_table_name(sf_dir, name)
            if spark.catalog.tableExists(table):
                df = spark.table(table)
                per_session[(sf_dir, name, True)] = df
        if df is not None:
            return df
        # Not materialized yet: fall through to the raw parquet WITHOUT
        # caching it under the bucketed key — a later
        # ensure_bucketed_facts in this session must take effect on the
        # next load_table call, not be shadowed by this fallback.
    df = per_session.get((sf_dir, name, False))
    if df is None:
        if name == "events":
            df = load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        per_session[(sf_dir, name, False)] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Open every testdata table in ``sf_dir`` and (optionally) register
    each as a temp view so ``spark.sql`` sees the same names the DuckDB
    oracle does."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
