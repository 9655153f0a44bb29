"""Z-order layout pins: the Morton key itself, and the thing it exists
for — parquet row-group min/max statistics become selective on BOTH
dimensions, measured from the actual files with pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F


def test_zorder_key_bit_interleaving(spark):
    from minoan_athenaeum_spark.sources.parquet_sink import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)


def _avg_span_fraction(path, col, domain):
    """Mean fraction of the value domain each row group's [min,max]
    covers for ``col`` — 1.0 means stats are useless, small means a
    point/range filter can skip most groups."""
    spans, lo_d, hi_d = [], *domain
    for f in glob.glob(f"{path}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    spans.append((s.max - s.min) / (hi_d - lo_d))
    assert spans, f"no row-group stats found for {col}"
    return sum(spans) / len(spans)


def test_zorder_collapses_both_dimensions(spark, tmp_path):
    """64k rows on a 256x256 grid, small row groups so each file holds
    several. Plain x-sort: x-spans tiny, y-spans ~the whole domain.
    Z-ordered: BOTH dimensions' average row-group span collapses —
    that is the pruning surface a query on either column uses."""

    n = 256
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    plain = str(tmp_path / "plain")
    (
        grid.repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(plain)
    )
    zpath = str(tmp_path / "zord")
    from minoan_athenaeum_spark.sources.parquet_sink import zorder_key

    keyed = grid.withColumn("__z", zorder_key(F.col("x"), F.col("y"), 9))
    (
        keyed.repartitionByRange(4, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(zpath)
    )

    dom = (0, n - 1)
    plain_x = _avg_span_fraction(plain, "x", dom)
    plain_y = _avg_span_fraction(plain, "y", dom)
    z_x = _avg_span_fraction(zpath, "x", dom)
    z_y = _avg_span_fraction(zpath, "y", dom)
    # Plain x-sort: x clustered, y useless.
    assert plain_x < 0.35
    assert plain_y > 0.8
    # Z-order: both clustered — y dramatically better than plain, x
    # still far from useless.
    assert z_y < 0.5 * plain_y, (z_y, plain_y)
    assert z_x < 0.7, z_x
    # Round trip: same data either way — also through the packaged
    # writer API.
    assert spark.read.parquet(zpath).count() == n * n
    from minoan_athenaeum_spark.sources.parquet_sink import write_zordered

    api_path = str(tmp_path / "api")
    write_zordered(grid, api_path, ("x", "y"), bits=9, target_file_partitions=4)
    got = spark.read.parquet(api_path)
    assert got.count() == n * n
    assert set(got.columns) == {"x", "y", "payload"}
