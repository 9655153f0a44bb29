"""Property pins for the round-5 operators on synthetic/adversarial
inputs (the sf-data DuckDB twins live in tests/test_oracle_parity.py):
Bloom no-false-negatives, CM-sketch overestimate guarantee under
adversarial skew, KMV merge==direct algebra, priority-sampling
Horvitz-Thompson sanity, largest-remainder quota exactness."""

from __future__ import annotations

from pyspark.sql import functions as F


def _h60(col, salt, mod):
    s = F.concat(col.cast("string"), F.lit(f":{salt}"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % mod


def test_bloom_never_false_negative_adversarial(spark):
    # 500 build keys, probes = build keys ∪ 500 non-members; tiny
    # m=512 bits forces heavy collision pressure (fp rate high) — the
    # no-false-negative guarantee must hold regardless.
    m, k = 512, 3
    build = spark.range(0, 500).select(F.col("id").alias("key"))
    probes = spark.range(0, 1000).select(F.col("id").alias("key"))
    kpos = build.select(
        F.explode(F.array(*[_h60(F.col("key"), j, m) for j in range(k)])).alias("pos")
    )
    bloom = kpos.groupBy((F.col("pos") / 32).cast("bigint").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")).alias(
            "bits"
        )
    )
    pr = probes.select(
        "key",
        F.explode(F.array(*[_h60(F.col("key"), j, m) for j in range(k)])).alias("pos"),
    )
    member = (
        pr.join(F.broadcast(bloom), (F.col("pos") / 32).cast("bigint") == F.col("w"), "left")
        .select(
            "key",
            (
                F.expr(
                    "shiftright(coalesce(bits, CAST(0 AS BIGINT)), CAST(pos % 32 AS INT)) & 1"
                )
                == 1
            ).cast("int").alias("b"),
        )
        .groupBy("key")
        .agg(F.min("b").alias("is_member"))
    )
    got = {r.key: r.is_member for r in member.collect()}
    false_neg = [key for key in range(500) if got[key] == 0]
    assert not false_neg, f"bloom false negatives: {false_neg[:5]}"
    # collision pressure is real at m/n ≈ 1: some false positives exist
    assert sum(got[key] for key in range(500, 1000)) > 0


def test_count_min_overestimate_under_adversarial_skew(spark):
    # one key holds 90% of the mass; every estimate must still be >= exact
    from minoan_athenaeum_spark.queries.sketches import _CM_W

    skewed = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    cells = (
        skewed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), _h60(F.col("k"), j, _CM_W).alias("i"))
                        for j in range(3)
                    ]
                )
            ).alias("c")
        )
        .select("c.j", "c.i")
        .groupBy("j", "i")
        .agg(F.count("*").alias("n"))
    )
    exact = skewed.groupBy("k").agg(F.count("*").alias("x"))
    probe = exact.select(
        "k",
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _h60(F.col("k"), j, _CM_W).alias("i"))
                    for j in range(3)
                ]
            )
        ).alias("c"),
    ).select("k", "x", "c.j", "c.i")
    est = (
        probe.join(F.broadcast(cells), ["j", "i"])
        .groupBy("k", "x")
        .agg(F.min("n").alias("e"))
    )
    assert est.where(F.col("e") < F.col("x")).count() == 0


def test_kmv_merge_equals_direct_random_partitions(spark):
    # k smallest of the union of per-partition bottom-k == global bottom-k
    k = 64
    vals = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("part"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    ).distinct()
    from minoan_athenaeum_spark.operators.scan import grouped_topk_two_phase

    partial = grouped_topk_two_phase(vals, ["part"], ["hv"], k).select("hv")
    merged = [r.hv for r in partial.distinct().orderBy("hv").limit(k).collect()]
    direct = [r.hv for r in vals.select("hv").distinct().orderBy("hv").limit(k).collect()]
    assert merged == direct


def test_priority_sample_ht_weights_bounded(spark):
    # adjusted weight is max(w, tau) >= w, and the HT estimate of the
    # total is within a loose factor on this deterministic draw
    rows = [(i, (i % 13) + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w long")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("p:"), F.col("id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint")
        + 1
    ).cast("double") / float(1 << 60)
    pri = df.withColumn("q", F.col("w").cast("double") / u)
    k = 50
    top = pri.orderBy(F.col("q").desc(), "id").limit(k + 1)
    tau = top.agg(F.min("q").alias("tau"))
    sample = (
        top.orderBy(F.col("q").desc(), "id")
        .limit(k)
        .crossJoin(F.broadcast(tau))
        .select("w", F.greatest(F.col("w").cast("double"), F.col("tau")).alias("aw"))
    )
    rows = sample.collect()
    assert all(r.aw >= r.w for r in rows)
    total = sum(w for _, w in [(i, (i % 13) + 1) for i in range(400)])
    ht = sum(r.aw for r in rows)
    assert 0.5 * total < ht < 2.0 * total


def test_priority_sample_tiny_corpus(spark, tmp_path):
    """At <= k items no (k+1)-th priority exists, so the estimator
    degenerates to the trivial EXACT sample: every item returned with
    adj_weight = weight (inclusion probability 1 — the HT estimate is
    then exactly the corpus total). Engine and oracle share the CASE
    branch; previously this returned zero rows, surprising callers who
    sampled a small source."""
    import duckdb

    from minoan_athenaeum_spark.queries.pipeline import (
        _PRIO_K,
        _PRIO_ORACLE,
        pipeline_priority_sample,
    )

    sf_dir = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * (i + 1), "web") for i in range(_PRIO_K)],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = pipeline_priority_sample(spark, sf_dir).collect()
    assert len(got) == _PRIO_K
    # exact sample: adjusted weight IS the weight, HT sum == corpus sum
    assert all(r.adj_weight == float(r.weight) for r in got)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle = con.execute(_PRIO_ORACLE).fetchall()
    assert sorted((r[0], r[1], r[3]) for r in oracle) == sorted(
        (r.doc_id, r.weight, r.adj_weight) for r in got
    )


def test_mixing_quota_exactness_synthetic(spark):
    # largest-remainder quotas: sum == budget exactly, each quota within
    # 1 of the real-valued proportional share (Hamilton's method bound)
    from pyspark.sql import Window as W

    budget = 97
    counts = [("a", 5), ("b", 17), ("c", 3), ("d", 211), ("e", 64)]
    src = spark.createDataFrame(counts, "source string, n long")
    tot = src.agg(F.sum("n").alias("c"))
    q0 = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "c",
        F.expr(f"({budget} * n) div c").alias("fq"),
        (F.lit(budget) * F.col("n") % F.col("c")).alias("rem"),
    )
    leftover = q0.agg((F.lit(budget) - F.sum("fq")).alias("lo"))
    ranked = q0.crossJoin(F.broadcast(leftover)).withColumn(
        "rr", F.row_number().over(W.orderBy(F.col("rem").desc(), "source"))
    )
    quota = ranked.select(
        "source",
        "n",
        "c",
        (F.col("fq") + F.when(F.col("rr") <= F.col("lo"), 1).otherwise(0)).alias("q"),
    )
    got = {r.source: (r.q, r.n, r.c) for r in quota.collect()}
    assert sum(q for q, _, _ in got.values()) == budget
    for q, n, c in got.values():
        share = budget * n / c
        assert share - 1 < q < share + 1


def test_skyline_2d_edge_cases(spark):
    from minoan_athenaeum_spark.operators.skyline import skyline_2d

    # anti-chain: x up, y down -> every point on the frontier
    anti = spark.createDataFrame(
        [(i, i, 10 - i) for i in range(10)], "id long, x long, y long"
    )
    assert skyline_2d(anti, "x", "y").count() == 10
    # chain: x up, y up -> only the top point survives
    chain = spark.createDataFrame(
        [(i, i, i) for i in range(10)], "id long, x long, y long"
    )
    got = skyline_2d(chain, "x", "y").collect()
    assert [(r.x, r.y) for r in got] == [(9, 9)]
    # all-identical points: none strictly dominates -> all survive
    flat = spark.createDataFrame(
        [(i, 5, 5) for i in range(6)], "id long, x long, y long"
    )
    assert skyline_2d(flat, "x", "y").count() == 6
    # duplicate frontier corners + interior dominated points
    mix = spark.createDataFrame(
        [(0, 1, 9), (1, 1, 9), (2, 9, 1), (3, 5, 5), (4, 4, 4)],
        "id long, x long, y long",
    )
    got = {(r.x, r.y) for r in skyline_2d(mix, "x", "y").collect()}
    assert got == {(1, 9), (9, 1), (5, 5)}
    assert skyline_2d(mix, "x", "y").count() == 4  # both (1,9) copies


def test_skyline_2d_fractional_x(spark):
    """Regression: distinct fractional x values sharing an integer part
    must still dominate each other (the old long-cast RANGE frame
    treated 1.2 and 1.8 as equal-x and let dominated points survive)."""
    from minoan_athenaeum_spark.operators.skyline import skyline_2d

    pts = spark.createDataFrame(
        [(0, 1.2, 3.0), (1, 1.8, 5.0), (2, 0.4, 9.0), (3, 2.6, 1.0)],
        "id long, x double, y double",
    )
    # (1.2, 3) is strictly dominated by (1.8, 5); the rest are frontier
    got = {(r.x, r.y) for r in skyline_2d(pts, "x", "y").collect()}
    assert got == {(1.8, 5.0), (0.4, 9.0), (2.6, 1.0)}
    # dense fractional chain inside one integer bucket: only the top survives
    chain = spark.createDataFrame(
        [(i, 1.0 + i / 10.0, float(i)) for i in range(8)],
        "id long, x double, y double",
    )
    assert [(r.x, r.y) for r in skyline_2d(chain, "x", "y").collect()] == [
        (1.7, 7.0)
    ]
