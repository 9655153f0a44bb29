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


def test_zorder_key_three_columns_and_bit_budget(spark):
    from minoan_athenaeum_spark.sources.parquet_sink import zorder_key

    import pytest

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (5, 3, 7)],
        "x long, y long, w long",
    )
    got = {
        (r.x, r.y, r.w): r.z
        for r in df.select(
            "x", "y", "w",
            zorder_key(F.col("x"), F.col("y"), F.col("w"), bits=8).alias("z"),
        ).collect()
    }

    def morton3(x, y, w):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (3 * i)
            z |= ((y >> i) & 1) << (3 * i + 1)
            z |= ((w >> i) & 1) << (3 * i + 2)
        return z

    for (x, y, w), z in got.items():
        assert z == morton3(x, y, w), (x, y, w, z)

    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(F.col("x"), F.col("y"), F.col("w"), bits=22)
    with pytest.raises(ValueError, match="at least two"):
        zorder_key(F.col("x"))


def test_hilbert_key_matches_reference_walk(spark):
    """Pin the DFA against a standalone xy→d conversion (the iterative
    rotate/flip formulation from the public Hilbert-curve literature),
    plus the adjacency property that defines the curve: consecutive
    keys differ by exactly one unit step in exactly one coordinate."""
    from minoan_athenaeum_spark.sources.parquet_sink import hilbert_key

    def xy2d(order_bits, x, y):
        rx = ry = 0
        d = 0
        s = 1 << (order_bits - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:  # rotate
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.h
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h")
        ).collect()
    }
    assert got == {(x, y): xy2d(4, x, y) for x in range(n) for y in range(n)}

    walk = sorted(got, key=got.get)
    assert sorted(got.values()) == list(range(n * n))  # a bijection
    for (x0, y0), (x1, y1) in zip(walk, walk[1:]):
        assert abs(x0 - x1) + abs(y0 - y1) == 1  # unit steps only


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

    keyed = grid.withColumn("__z", zorder_key(F.col("x"), F.col("y"), bits=9))
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

    # Hilbert layout: at least Morton's locality on both dimensions
    # (no long diagonal jumps), measured on the same grid/row groups.
    from minoan_athenaeum_spark.sources.parquet_sink import write_zordered

    hpath = str(tmp_path / "hilb")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    from minoan_athenaeum_spark.sources.parquet_sink import hilbert_key

    (
        grid.withColumn("__z", hilbert_key(F.col("x"), F.col("y"), bits=9))
        .repartitionByRange(4, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(hpath)
    )
    h_x = _avg_span_fraction(hpath, "x", dom)
    h_y = _avg_span_fraction(hpath, "y", dom)
    assert h_x <= z_x * 1.1 and h_y <= z_y * 1.1, (h_x, z_x, h_y, z_y)
    assert h_x < 0.7 and h_y < 0.5 * plain_y

    # Round trip through the packaged writer API (hilbert curve):
    # same data, layout is metadata only.
    api_path = str(tmp_path / "api")
    write_zordered(
        grid, api_path, ("x", "y"), bits=9,
        target_file_partitions=4, curve="hilbert",
    )
    got = spark.read.parquet(api_path)
    assert got.count() == n * n
    assert set(got.columns) == {"x", "y", "payload"}


def test_zorder_three_column_layout_spans(spark, tmp_path):
    """VERDICT r3 #5 'done' criterion: row-group span collapse holds
    for THREE clustered columns. 64^3 grid; plain x-sort leaves y and w
    row-group spans ~ the whole domain, 3-column Morton halves both."""
    n = 64
    grid = spark.range(n * n * n).select(
        (F.col("id") % n).alias("x"),
        ((F.col("id") / n).cast("long") % n).alias("y"),
        (F.col("id") / (n * n)).cast("long").alias("w"),
    )
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    plain = str(tmp_path / "plain3")
    (
        grid.repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .option("parquet.block.size", 48 * 1024)
        .parquet(plain)
    )
    from minoan_athenaeum_spark.sources.parquet_sink import write_zordered

    zpath = str(tmp_path / "zord3")
    # write through the packaged API (3 columns, morton) with the same
    # small row groups as the plain control
    from minoan_athenaeum_spark.sources.parquet_sink import zorder_key

    (
        grid.withColumn(
            "__z", zorder_key(F.col("x"), F.col("y"), F.col("w"), bits=6)
        )
        .repartitionByRange(4, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", 48 * 1024)
        .parquet(zpath)
    )
    dom = (0, n - 1)
    plain_y = _avg_span_fraction(plain, "y", dom)
    plain_w = _avg_span_fraction(plain, "w", dom)
    z_x = _avg_span_fraction(zpath, "x", dom)
    z_y = _avg_span_fraction(zpath, "y", dom)
    z_w = _avg_span_fraction(zpath, "w", dom)
    # y is fully useless in the control; w (the slowest-varying
    # dimension) lands at ~0.7 because equal-x row groups tie-break
    # arbitrarily — still far from selective.
    assert plain_y > 0.8 and plain_w > 0.6
    # all three dimensions clustered; y and w at least halved
    assert z_y < 0.5 * plain_y, (z_y, plain_y)
    assert z_w < 0.5 * plain_w, (z_w, plain_w)
    assert z_x < 0.8, z_x
    # API round-trip with curve selection
    api3 = str(tmp_path / "api3")
    write_zordered(grid, api3, ("x", "y", "w"), bits=6, target_file_partitions=4)
    assert spark.read.parquet(api3).count() == n * n * n
