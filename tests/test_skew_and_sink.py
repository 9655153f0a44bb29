from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.operators.skew import salted_agg, salted_join
from minoan_athenaeum_spark.sources.parquet_sink import read_parquet, write_parquet


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.cnt, float(r.sq))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sq"),
        )
        .collect()
    }
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "cnt": F.count("*"),
            "sq": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
        },
        salt_buckets=16,
    ).select(
        "l_returnflag", F.col("cnt"), F.col("sq").cast("double").alias("sq")
    )
    got = {(r.l_returnflag, r.cnt, float(r.sq)) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name")
        .collect()
    )
    got = salted_join(orders, customer, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_name"
    ).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in plain}
    assert len(got) == len(plain)


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join split demonstrated on a deliberately skewed join
    (VERDICT r3 #4) — the runtime complement to the salting operator:
    90% of fact rows share one key, broadcast is disabled, and with the
    skew thresholds scaled to test size the executed plan must show the
    hot partition split (`AQEShuffleRead ... skewed`). The salted path
    covers broadcast-infeasible cases AQE can't re-plan (aggregation
    skew, stream-side state); for plain batch joins THIS is the
    zero-code path a 100 TB job rides.

    forceOptimizeSkewedJoin is needed because the downstream aggregate
    adds a shuffle after the join, which otherwise vetoes the split
    (OptimizeSkewedJoin refuses to introduce extra exchanges). The
    payload must flow THROUGH the shuffle (the aggregate reads it) —
    a key-only shuffle of a constant hot key compresses below any
    realistic skew threshold, which is itself a scale lesson: skew is
    measured in bytes, not rows."""
    saved = {}
    skew_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    for k, v in skew_conf.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        n = 2_000_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 224).alias("dimval"),
        )
        q = (
            fact.join(dim, "k")
            .groupBy()
            .agg(F.sum(F.length("payload") + F.length("dimval")).alias("s"))
        )
        # 64-char sha256 hex + 56-char sha224 hex per surviving row
        assert q.collect()[0].s == n * (64 + 56)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        reads = [ln for ln in plan.splitlines() if "AQEShuffleRead" in ln]
        assert any("skewed" in ln for ln in reads), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_by_year")
        write_parquet(
            orders,
            path,
            partition_by=["o_year"],
            sort_within_partitions=["o_custkey"],
            target_file_partitions=2,
        )
        # Hive layout on disk.
        assert any(d.startswith("o_year=") for d in os.listdir(path))
        back = read_parquet(spark, path)
        assert back.count() == orders.count()
        # Partition pruning: a year filter must only list that partition.
        pruned = back.filter(F.col("o_year") == 1996)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pruned.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year = 1996" in plan
        assert pruned.count() == orders.filter(F.col("o_year") == 1996).count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Co-located bucketed join: both sides bucketed+sorted by the join
    key ⇒ the join plan contains NO Exchange (the shuffle happened once
    at write time — the decisive layout for recurring 100 TB joins)."""
    import contextlib
    import io

    from minoan_athenaeum_spark.sources.bucketed import read_table, write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    # Force the shuffle-join path (at this sf the dim would broadcast,
    # which also avoids a shuffle but hides the bucketing effect).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        j.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # And the result matches the plain (shuffled) join.
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
