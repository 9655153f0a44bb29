"""Bucketed-table layout: pre-shuffled storage for co-located joins.

Writing both sides of a recurring fact-fact join bucketed (and sorted)
by the join key removes the shuffle — and with sorted buckets, the
sort — from every subsequent join: the dominant cost of repeated
large-scale joins. This is the storage-layout analogue of the
reference's persistent per-column inverted indexes
(/root/reference/database.py:943-947): pay once at write, reuse every
query.

``ensure_bucketed_facts`` materializes the two big TPC-H facts
(lineitem, orders) bucketed + sorted on orderkey; setting
``SPARK_GRAFT_BUCKETED_FACTS=1`` then makes ``catalog.load_table``
serve them transparently, so EVERY registered query runs on the
pre-bucketed layout with zero code changes — the pay-shuffle-once
posture a 100 TB deployment would run with (scripts/bucketed_probe.py
records the measured A/B).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.bucketing import clear_stale_table_location

# (table, bucket key) for the facts worth pre-bucketing: every heavy
# TPC-H join/aggregate keys lineitem/orders on orderkey.
FACT_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The in-memory catalog forgets tables between sessions but their
    # warehouse directories persist — clear any orphaned location
    # (guarded: must be inside the file: warehouse and look like a
    # Spark-written table dir).
    clear_stale_table_location(spark, table)
    # Pre-partition on the bucket columns so each task holds exactly
    # one bucket's rows (repartition and bucketBy share the Murmur3
    # hash): one file per bucket, which is also the layout Spark
    # requires to USE the sortBy metadata at read time (multi-file
    # buckets force a re-sort under sort-merge joins).
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def _source_fingerprint(path: str) -> str:
    """Deterministic fingerprint of the parquet source: every data
    file's relative path, size, and mtime. Folding this into the managed
    table's name means a regenerated/changed source parquet no longer
    resolves to the previously materialized table — the stale copy is
    simply never served (and ensure_bucketed_facts builds a fresh one
    under the new tag)."""
    import os

    h = hashlib.md5()
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                fp = os.path.join(root, f)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:8]


def bucketed_fact_table_name(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fresh = _source_fingerprint(f"{sf_dir}/{name}.parquet")
    return f"mas_bfact_{name}_{tag}_{fresh}"


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Local-filesystem path the warehouse would give ``table``, or None
    when the warehouse isn't local."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    elif "://" in wh:
        return None
    return os.path.join(wh, table.lower())


def reattach_bucketed_table(
    spark: SparkSession,
    table: str,
    location: str,
    key: str,
    n_buckets: int,
) -> bool:
    """Register an EXISTING completed bucketed build (a previous
    session's warehouse directory — Spark's in-memory catalog forgets
    table metadata between sessions while the files persist) as a
    bucketed table via DDL, without rewriting a byte. The bucket spec
    lives in the catalog entry; Spark recovers per-file bucket ids from
    the bucketBy writer's file names. Returns False when the location
    has no completed build (no _SUCCESS), leaving a real write to the
    caller. The source fingerprint in ``table``'s name ties the files
    to the exact source data, so re-attachment can't serve stale rows."""
    import os

    if not (location and os.path.isfile(os.path.join(location, "_SUCCESS"))):
        return False
    schema = spark.read.parquet(location).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
    return True


def ensure_bucketed_facts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> dict[str, str]:
    """Materialize lineitem + orders from ``sf_dir`` as managed tables
    bucketed AND sorted on orderkey (full column sets, so they are
    drop-in replacements for the raw parquet). Idempotent per session
    AND across sessions: a later session finding the fingerprint-named
    build already on disk re-attaches it as metadata-only DDL (measured
    504 s → instant for the 614M-row 1024× build) instead of paying the
    bucketize again. Returns {table_name: managed_table}."""
    out = {}
    for name, key in FACT_KEYS.items():
        table = bucketed_fact_table_name(sf_dir, name)
        if not spark.catalog.tableExists(table):
            loc = _table_location(spark, table)
            if not reattach_bucketed_table(spark, table, loc, key, n_buckets):
                df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
                write_bucketed(
                    df, table, [key], n_buckets=n_buckets, sort_cols=[key]
                )
        out[name] = table
    return out
