"""Approximate (sketch) aggregates — the constant-memory path for
100 TB cardinality/quantile questions: HyperLogLog++ distinct counts
and Greenwald-Khanna approximate percentiles. Raw sketch estimates are
implementation-specific, so the oracle-checked surface is the
DETERMINISTIC part: the exact answers plus within-error-bound
verdicts (|approx − exact| / exact < 3·rsd ⇒ 1). The HLL estimate is
deterministic for fixed input, so a broken sketch flips a verdict to 0
and the value-hash gate catches it; the raw-estimate error magnitudes
stay pinned in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query

_HLL_ORACLE = """
    SELECT l_returnflag AS rflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS BIGINT) AS orders_within_bound,
           CAST(1 AS BIGINT) AS parts_within_bound
    FROM lineitem
    GROUP BY 1
"""


@query("sketch_hll_distinct", oracle=_HLL_ORACLE, tags=("sketch", "approx"))
def sketch_hll_distinct(spark, sf_dir):
    """HLL++ distinct orderkeys/partkeys per return flag (rsd=2%).
    At scale this replaces the exact two-phase COUNT(DISTINCT) expand
    with a fixed-size mergeable sketch — no second shuffle.

    Output is the deterministic projection of the sketch: exact
    distinct counts plus a 0/1 verdict that the HLL estimate landed
    within 3·rsd of exact (a 3-sigma bound the estimator satisfies on
    this data; any regression in the sketch path flips it). The oracle
    computes the exact counts and asserts the verdicts are 1."""
    rsd = 0.02
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def within(approx, exact):
        rel = F.abs(approx.cast("double") - exact) / exact
        return (rel < 3 * rsd).cast("bigint")

    return agg.select(
        "rflag",
        "exact_orders",
        "exact_parts",
        within(F.col("approx_orders"), F.col("exact_orders")).alias(
            "orders_within_bound"
        ),
        within(F.col("approx_parts"), F.col("exact_parts")).alias(
            "parts_within_bound"
        ),
    )


_PCT_ORACLE = """
    WITH r AS (
      SELECT l_returnflag AS rflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT rflag,
           MAX(n) AS n_rows,
           MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN l_extendedprice END) AS p25_exact,
           MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN l_extendedprice END) AS p50_exact,
           MAX(CASE WHEN rn = (n - 1) * 3 // 4 + 1 THEN l_extendedprice END) AS p75_exact,
           CAST(1 AS BIGINT) AS p25_within_bound,
           CAST(1 AS BIGINT) AS p50_within_bound,
           CAST(1 AS BIGINT) AS p75_within_bound
    FROM r GROUP BY rflag
"""


@query("sketch_approx_percentiles", oracle=_PCT_ORACLE, tags=("sketch", "approx"))
def sketch_approx_percentiles(spark, sf_dir):
    """GK-sketch p25/p50/p75 of extended price per return flag
    (accuracy 10000 ⇒ rank error ≤ max(n/10000, 1)).

    Like `sketch_hll_distinct`, the oracle-checked surface is the
    DETERMINISTIC projection: the exact percentiles as rank-selected
    data values (rank ``floor((n-1)·p)+1`` when ordered by value —
    ties in value make any tie-break yield the same selected VALUE,
    so this is engine-portable) plus 0/1 verdicts that each sketch
    output's actual rank lands within 0.5 % of the target rank (50×
    the sketch's guaranteed bound — a regression in the GK path flips
    a verdict and the value-hash gate catches it). The raw sketch
    values' tighter error stays pinned in tests/test_sketches.py."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rflag"),
        F.col("l_extendedprice").alias("price"),
    )
    # Sketch side: one pass, constant memory per group — the 100 TB
    # shape. percentile_approx returns actual elements of the data.
    approx = li.groupBy("rflag").agg(
        F.percentile_approx("price", [0.25, 0.5, 0.75], 10000).alias("apcts"),
    )
    # Verdict side: the rank of each sketch output within its group
    # (computed with one broadcast of the 3×3 approx values — the
    # corpus is scanned, never shuffled).
    a = approx.select(
        "rflag",
        F.posexplode("apcts").alias("pos", "aval"),
    ).withColumn("p", (F.col("pos") + 1) * 0.25)
    ranked = (
        li.join(F.broadcast(a), "rflag")
        .groupBy("rflag", "p")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("price") <= F.col("aval")).cast("bigint")).alias("rk"),
        )
        .withColumn(
            "within",
            (
                F.abs(F.col("rk") - F.col("p") * F.col("n"))
                <= 0.005 * F.col("n") + 1
            ).cast("bigint"),
        )
    )
    verdicts = ranked.groupBy("rflag").agg(
        F.max("n").alias("n_rows"),
        F.max(F.when(F.col("p") == 0.25, F.col("within"))).alias(
            "p25_within_bound"
        ),
        F.max(F.when(F.col("p") == 0.50, F.col("within"))).alias(
            "p50_within_bound"
        ),
        F.max(F.when(F.col("p") == 0.75, F.col("within"))).alias(
            "p75_within_bound"
        ),
    )
    # Exact side: rank selection (same convention as the oracle).
    from pyspark.sql import Window as W

    r = li.select(
        "rflag",
        "price",
        F.row_number()
        .over(W.partitionBy("rflag").orderBy("price"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("rflag")).alias("n"),
    )
    exact = r.groupBy("rflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") - 1) / 4) + 1,
                F.col("price"),
            )
        ).alias("p25_exact"),
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1,
                F.col("price"),
            )
        ).alias("p50_exact"),
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") - 1) * 3 / 4) + 1,
                F.col("price"),
            )
        ).alias("p75_exact"),
    )
    return verdicts.join(exact, "rflag").select(
        "rflag",
        "n_rows",
        "p25_exact",
        "p50_exact",
        "p75_exact",
        "p25_within_bound",
        "p50_within_bound",
        "p75_within_bound",
    )


_HEAVY_HITTERS_ORACLE = r"""
    WITH stream AS (
      SELECT CASE WHEN l_linenumber >= 3 THEN 'hot_' || CAST(l_orderkey % 3 AS VARCHAR)
                  ELSE 'cold_' || CAST(l_partkey AS VARCHAR) END AS key
      FROM lineitem
    ), tot AS (
      SELECT COUNT(*) AS n FROM stream
    )
    SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM stream, tot
    GROUP BY key, tot.n
    HAVING COUNT(*) * 20 > tot.n
"""


@query(
    "sketch_heavy_hitters",
    oracle=_HEAVY_HITTERS_ORACLE,
    tags=("sketch", "heavy-hitters"),
)
def sketch_heavy_hitters(spark, sf_dir):
    """Frequent items (> n/20 of a skewed key stream) via per-partition
    MISRA-GRIES summaries + exact candidate re-count
    (operators/heavyhitters.py). The stream is lineitem keyed so that
    ~3 hot keys carry more than half the rows while ~2·sf·100k cold
    keys carry the rest — the sketch pass holds 20 counters per
    partition against tens of thousands of distinct keys, and the
    verification shuffle re-counts only the surviving candidates
    (output-sized, not input-sized): the 100 TB plan for "what are the
    dominant values" questions.

    The output is DETERMINISTIC despite the sketch (MG guarantees the
    candidate union is a superset of every key above the threshold;
    the exact pass then decides membership), which is why a plain
    GROUP BY ... HAVING cnt*20 > n oracle can gate it. Adversarial
    partitionings and the superset guarantee are pinned in
    tests/test_heavy_hitters.py."""
    from minoan_athenaeum_spark.operators.heavyhitters import heavy_hitters

    li = t(spark, sf_dir, "lineitem")
    stream = li.select(
        F.when(
            F.col("l_linenumber") >= 3,
            F.concat(F.lit("hot_"), (F.col("l_orderkey") % 3).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("l_partkey").cast("string")))
        .alias("key")
    )
    return heavy_hitters(stream, "key", 20)


_HLL_MERGE_ORACLE = """
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           CAST(1 AS BIGINT) AS merged_within_bound,
           CAST(1 AS BIGINT) AS direct_within_bound
    FROM orders
    GROUP BY 1
"""


@query("sketch_hll_mergeable", oracle=_HLL_MERGE_ORACLE, tags=("sketch", "mergeable"))
def sketch_hll_mergeable(spark, sf_dir):
    """SKETCH MERGEABILITY — the property that makes sketches the
    100 TB answer: per-(priority, year) PARTIAL HLL sketches
    (hll_sketch_agg, Apache DataSketches binaries) are materialized
    first, then UNIONED per priority (hll_union_agg) and estimated —
    exactly how a sketch STORE serves "distinct customers this quarter"
    from pre-aggregated daily sketches without touching raw data.

    Deterministic surface: exact distinct customers per priority plus
    two accuracy verdicts the oracle asserts are 1 — the MERGED
    estimate and the DIRECT estimate each land within 3% of exact
    (lgK = 12 gives ~0.8% RSE, so 3% is a > 3-sigma bound). The two
    estimates are deliberately NOT asserted equal: union-of-maxima is
    lossless in REGISTER STATE, but a direct sketch serves the HIP
    (historical-inverse-probability) estimator while a post-union
    sketch must fall back to the composite estimator, so the numbers
    legitimately diverge once sketches leave the exact coupon-list
    mode (reproduced at sf0.01; equal at sf0.001 where every group is
    still a coupon list)."""
    o = t(spark, sf_dir, "orders")
    partials = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = partials.groupBy("priority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("direct_est"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    j = merged.join(direct, "priority")
    rel = F.abs(F.col("merged_est").cast("double") - F.col("exact_custs")) / F.col(
        "exact_custs"
    )
    return j.select(
        "priority",
        "exact_custs",
        (rel < 0.03).cast("bigint").alias("merged_within_bound"),
        (
            F.abs(F.col("direct_est").cast("double") - F.col("exact_custs"))
            / F.col("exact_custs")
            < 0.03
        )
        .cast("bigint")
        .alias("direct_within_bound"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (portable-hash, exact-verified)
# ---------------------------------------------------------------------------

_BLOOM_M = 65536          # filter size in bits
_BLOOM_WORDS = _BLOOM_M // 32   # packed as 32-bit words in BIGINTs (sign-safe)
_BLOOM_K = 3              # hash functions

_BLOOM_ORACLE = f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ), kpos AS (
      SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)
             % {_BLOOM_M} AS pos
      FROM keys, UNNEST([0, 1, 2]) AS u(j)
    ), bloom AS (
      SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS word
      FROM kpos GROUP BY 1
    ), probe AS (
      SELECT c.c_custkey,
             CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 15)) AS BIGINT)
             % {_BLOOM_M} AS pos
      FROM customer c, UNNEST([0, 1, 2]) AS u(j)
    ), hit AS (
      SELECT p.c_custkey,
             min(CASE WHEN (coalesce(b.word, 0) >> (p.pos % 32)) & 1 = 1 THEN 1 ELSE 0 END) AS bloom_member
      FROM probe p LEFT JOIN bloom b ON b.word_idx = p.pos // 32
      GROUP BY 1
    ), truth AS (
      SELECT c_custkey,
             CASE WHEN c_custkey IN (SELECT k FROM keys) THEN 1 ELSE 0 END AS exact_member
      FROM customer
    ), cls AS (
      SELECT h.c_custkey, h.bloom_member, t.exact_member
      FROM hit h JOIN truth t USING (c_custkey)
    )
    SELECT (SELECT count(*) FROM keys) AS n_keys,
           count(*) AS n_probes,
           CAST(sum(CASE WHEN bloom_member = 1 AND exact_member = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos,
           CAST(sum(CASE WHEN bloom_member = 1 AND exact_member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN bloom_member = 0 AND exact_member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_neg,
           CAST(sum(CASE WHEN bloom_member = 0 AND exact_member = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           (SELECT CAST(sum(bit_count(word)) AS BIGINT) FROM bloom) AS n_set_bits
    FROM cls
"""


@query("sketch_bloom_membership", oracle=_BLOOM_ORACLE, tags=("sketch", "bloom"))
def sketch_bloom_membership(spark, sf_dir):
    """Distributed Bloom filter build + probe, exact-verified: the
    constant-size membership sketch under join pruning, semi-join
    pushdown, and dedup-against-history at 100 TB (Spark's own runtime
    bloom joins use the same structure; this surfaces it as a
    first-class, engine-portable operator).

    Build: every build key sets K=3 bit positions from the portable
    md5-derived 60-bit hash; positions pack into 2048 sign-safe 32-bit
    words via a single bit_or groupBy (no distinct needed — bit_or is
    idempotent, so duplicate keys cost nothing and the build is ONE
    dict-sized shuffle). Probe: each probe key joins its 3 words
    against the BROADCAST 2048-row filter — map-only per probe row.
    The output cross-tabs bloom verdicts against exact membership
    (semi-join truth): n_false_neg MUST be 0 (structural guarantee —
    the oracle and the value-hash pin it), n_false_pos is the measured
    fp count at m/n ≈ 44 bits/key (sf0.001), and n_set_bits pins every
    single bit of the filter via popcount.

    At scale: the filter is O(m) bytes regardless of corpus size,
    built in one pass, broadcast once; probes never shuffle.
    """
    m, k = _BLOOM_M, _BLOOM_K
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def h60(key_col, j):
        s = F.concat(key_col.cast("string"), F.lit(f":{j}"))
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % m

    keys = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    kpos = keys.select(
        F.explode(F.array(*[h60(F.col("k"), j) for j in range(k)])).alias("pos")
    )
    bloom = kpos.groupBy((F.col("pos") / 32).cast("bigint").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")).alias("word")
    )
    probe = cust.select("c_custkey").select(
        "c_custkey",
        F.explode(F.array(*[h60(F.col("c_custkey"), j) for j in range(k)])).alias("pos"),
    )
    hit = (
        probe.join(
            F.broadcast(bloom),
            (F.col("pos") / 32).cast("bigint") == F.col("word_idx"),
            "left",
        )
        .select(
            "c_custkey",
            (
                F.expr(
                    "shiftright(coalesce(word, CAST(0 AS BIGINT)),"
                    " CAST(pos % 32 AS INT)) & 1"
                )
                == 1
            ).cast("int").alias("bit_set"),
        )
        .groupBy("c_custkey")
        .agg(F.min("bit_set").alias("bloom_member"))
    )
    # truth is the verification side only (the bloom IS the scale
    # path): an unbounded member set must not carry a broadcast hint —
    # it joins on the probe key and AQE picks the strategy
    truth = cust.select("c_custkey").join(
        keys.withColumnRenamed("k", "c_custkey"), "c_custkey", "left_semi"
    ).withColumn("exact_member", F.lit(1))
    cls = hit.join(truth, "c_custkey", "left").fillna({"exact_member": 0})
    key_stats = keys.agg(F.countDistinct("k").alias("n_keys"))
    bit_stats = bloom.agg(F.sum(F.bit_count("word")).alias("n_set_bits"))
    counted = cls.agg(
        F.count("*").alias("n_probes"),
        F.sum(((F.col("bloom_member") == 1) & (F.col("exact_member") == 1)).cast("bigint")).alias("n_true_pos"),
        F.sum(((F.col("bloom_member") == 1) & (F.col("exact_member") == 0)).cast("bigint")).alias("n_false_pos"),
        F.sum(((F.col("bloom_member") == 0) & (F.col("exact_member") == 0)).cast("bigint")).alias("n_true_neg"),
        F.sum(((F.col("bloom_member") == 0) & (F.col("exact_member") == 1)).cast("bigint")).alias("n_false_neg"),
    )
    return (
        counted.crossJoin(F.broadcast(key_stats))
        .crossJoin(F.broadcast(bit_stats))
        .select(
            "n_keys", "n_probes", "n_true_pos", "n_false_pos",
            "n_true_neg", "n_false_neg", "n_set_bits",
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (portable-hash, exact-verified point queries)
# ---------------------------------------------------------------------------

_CM_W = 1024   # counters per hash row
_CM_D = 3      # hash rows

_CM_ORACLE = f"""
    WITH item AS (
      SELECT l_suppkey AS k FROM lineitem
    ), cells AS (
      SELECT j,
             CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)
             % {_CM_W} AS idx,
             CAST(count(*) AS BIGINT) AS c
      FROM item, UNNEST([0, 1, 2]) AS u(j)
      GROUP BY 1, 2
    ), exact AS (
      SELECT k, CAST(count(*) AS BIGINT) AS exact_count FROM item GROUP BY 1
    ), probe AS (
      SELECT e.k, e.exact_count, u.j,
             CAST(('0x' || substr(md5(CAST(e.k AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 15)) AS BIGINT)
             % {_CM_W} AS idx
      FROM exact e, UNNEST([0, 1, 2]) AS u(j)
    ), est AS (
      SELECT p.k, p.exact_count, min(c.c) AS cm_estimate
      FROM probe p JOIN cells c ON c.j = p.j AND c.idx = p.idx
      GROUP BY 1, 2
    )
    SELECT k AS suppkey, exact_count, cm_estimate,
           CASE WHEN cm_estimate >= exact_count THEN 1 ELSE 0 END AS overestimate_ok
    FROM est
"""


@query("sketch_count_min", oracle=_CM_ORACLE, tags=("sketch", "count-min"))
def sketch_count_min(spark, sf_dir):
    """COUNT-MIN SKETCH (Cormode-Muthukrishnan 2005) build + point
    queries, exact-verified: the fixed-memory frequency sketch under
    streaming heavy-hitter screens and join-cardinality hints — the
    mergeable counterpart of sketch_heavy_hitters' Misra-Gries pass
    (MG bounds UNDERestimates; CM bounds OVERestimates — together they
    bracket the true frequency).

    Build: each item increments d=3 counters (portable md5-derived
    rows) — ONE groupBy over (row, idx) pairs whose map-side combine
    collapses the corpus to ≤ d·w = 3072 cells regardless of input
    size. Point queries: every distinct key joins its 3 cells against
    the BROADCAST sketch; the estimate is the min. The structural
    guarantee — CM never underestimates — is pinned per key
    (overestimate_ok = 1 for every row via the value-hash gate);
    the estimates themselves are deterministic integers the oracle
    recomputes cell-for-cell.

    At scale the sketch is O(d·w) counters however large the stream,
    built in one pass, mergeable by cell-wise addition.
    """
    w, d = _CM_W, _CM_D
    li = t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))

    def h60(key_col, j):
        s = F.concat(key_col.cast("string"), F.lit(f":{j}"))
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % w

    cells = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), h60(F.col("k"), j).alias("idx"))
                        for j in range(d)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.j", "cell.idx")
        .groupBy("j", "idx")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    exact = li.groupBy("k").agg(F.count("*").cast("bigint").alias("exact_count"))
    probe = exact.select(
        "k",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), h60(F.col("k"), j).alias("idx"))
                    for j in range(d)
                ]
            )
        ).alias("cell"),
    ).select("k", "exact_count", "cell.j", "cell.idx")
    est = (
        probe.join(F.broadcast(cells), ["j", "idx"])
        .groupBy("k", "exact_count")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return est.select(
        F.col("k").alias("suppkey"),
        "exact_count",
        "cm_estimate",
        F.when(F.col("cm_estimate") >= F.col("exact_count"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("overestimate_ok"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — estimate itself oracle-exact
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SCALE = str(1 << 60)

_KMV_ORACLE = f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag AS rflag,
             CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM lineitem
    ), ranked AS (
      SELECT rflag, hv, row_number() OVER (PARTITION BY rflag ORDER BY hv) AS rn
      FROM h
    ), partial AS (
      -- per-group KMV summaries (k smallest hashes per return flag)
      SELECT rflag, hv FROM ranked WHERE rn <= {_KMV_K}
    ), merged AS (
      -- merge = union of partials, re-take the k smallest
      SELECT hv, row_number() OVER (ORDER BY hv) AS rn
      FROM (SELECT DISTINCT hv FROM partial)
    ), direct AS (
      -- direct global KMV over all distinct hashes
      SELECT hv, row_number() OVER (ORDER BY hv) AS rn
      FROM (SELECT DISTINCT hv FROM h)
    )
    SELECT (SELECT hv FROM direct WHERE rn = {_KMV_K}) AS kmv_kth_hash,
           (SELECT CAST(CAST({_KMV_K} - 1 AS HUGEINT) * {_KMV_SCALE} // hv AS BIGINT) FROM direct WHERE rn = {_KMV_K}) AS kmv_estimate,
           CASE WHEN (SELECT hv FROM merged WHERE rn = {_KMV_K})
                   = (SELECT hv FROM direct WHERE rn = {_KMV_K})
                THEN 1 ELSE 0 END AS merged_equals_direct
"""


@query("sketch_kmv_distinct", oracle=_KMV_ORACLE, tags=("sketch", "kmv"))
def sketch_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) DISTINCT-COUNT SKETCH
    (Bar-Yossef et al. 2002): keep the k=256 smallest DISTINCT
    portable-hash values; estimate distinct = (k-1)·2^60 / h_(k) —
    INTEGER floor division over the md5-derived hashes, so unlike HLL
    (whose register math is implementation-specific and only
    verdict-gated in sketch_hll_distinct) the KMV ESTIMATE ITSELF is
    bit-exact against the DuckDB twin.

    Mergeability is pinned EXACTLY, not approximately: per-returnflag
    partial KMVs are merged (union → re-take k smallest) and the
    merged k-th minimum must equal the direct global k-th minimum —
    guaranteed because each partial retains a superset of its group's
    contribution to the global bottom-k. That equality is the algebra
    that lets 1000 executors sketch independently and combine.

    Scale shape: NO corpus-wide distinct anywhere — the earlier form's
    `.distinct()` over the hash projection scaled with global distinct
    cardinality (262 s at 1024× / 340M keys), which defeats a
    constant-size sketch. The corpus pass is the JVM sketch-then-verify
    prefilter (operators/kmv.py::kmv_candidates_jvm): per-group
    approx-distinct → hash-range threshold ≈ margin·k/D_est → codegen
    scan+filter keeps ~margin·k rows per group REGARDLESS of corpus
    size, map-side-combined dedup, and a sufficiency check (≥ k
    distinct survivors per group, else widen ×8; unconditionally exact
    after the fallback to full range). Everything downstream
    (per-group bottom-k, merge, global k-th, estimate) is
    candidate-sized. The Arrow per-partition-partials operator
    (kmv_partition_partials) remains the mergeable-summaries form for
    pipelines that need per-executor sketches; both are exact and the
    DuckDB twin computes the same k-th hash from the FULL distinct
    set, so the value-hash match proves the candidate reduction
    lossless. The ±10% accuracy-vs-exact check lives in
    tests/test_sketches.py::test_kmv_estimate_within_10pct_of_exact
    (bounded slice), keeping exactness proofs out of the gated plan.
    """
    from minoan_athenaeum_spark.operators.kmv import kmv_candidates_jvm
    from minoan_athenaeum_spark.operators.scan import grouped_topk_two_phase

    k = _KMV_K
    scale = 1 << 60
    li = t(spark, sf_dir, "lineitem")
    hashed = li.select(
        F.col("l_returnflag").alias("rflag"),
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    # verified-exact candidate set (~margin·k rows per group), already
    # distinct on (g, hv) and pinned for the merged/direct branches
    cand = kmv_candidates_jvm(hashed, "rflag", "hv", k)
    per_group = grouped_topk_two_phase(cand, ["g"], ["hv"], k)
    merged_kth = (
        per_group.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("m_kth"))
    )
    direct_kth = (
        cand.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("d_kth"))
    )
    return (
        direct_kth.crossJoin(F.broadcast(merged_kth))
        .select(
            F.col("d_kth").cast("bigint").alias("kmv_kth_hash"),
            F.expr(
                f"CAST((CAST({k} - 1 AS DECIMAL(38,0)) * {scale}) div d_kth AS BIGINT)"
            ).alias("kmv_estimate"),
            F.when(F.col("m_kth") == F.col("d_kth"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("merged_equals_direct"),
        )
    )


# ---------------------------------------------------------------------------
# KMV set algebra: intersection / Jaccard estimation from bottom-k sketches
# ---------------------------------------------------------------------------

_KMVI_K = 256

_KMVI_ORACLE = f"""
    WITH a AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM orders WHERE o_orderstatus = 'F'
    ), b AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM orders WHERE o_orderstatus = 'O'
    ), u AS (
      SELECT hv FROM (SELECT hv FROM a UNION SELECT hv FROM b)
      ORDER BY hv LIMIT {_KMVI_K}
    ), kth AS (
      SELECT max(hv) AS kth_min, CAST(count(*) AS BIGINT) AS ksz FROM u
    ), marked AS (
      SELECT u.hv,
             CASE WHEN u.hv IN (SELECT hv FROM a) AND u.hv IN (SELECT hv FROM b)
                  THEN 1 ELSE 0 END AS in_both
      FROM u
    ), est AS (
      SELECT (SELECT CAST(sum(in_both) AS BIGINT) FROM marked) AS j_num,
             (SELECT ksz FROM kth) AS k_used,
             CASE WHEN (SELECT ksz FROM kth) < {_KMVI_K} THEN (SELECT ksz FROM kth)
                  ELSE CAST(CAST({_KMVI_K} - 1 AS HUGEINT) * {1 << 60} // (SELECT kth_min FROM kth) AS BIGINT)
             END AS union_est
    ), exact AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
             (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (hv)) AS n_inter,
             (SELECT CAST(count(*) AS BIGINT) FROM (SELECT hv FROM a UNION SELECT hv FROM b)) AS n_union
    )
    SELECT exact.n_a, exact.n_b, exact.n_inter, exact.n_union,
           est.j_num, est.k_used, est.union_est,
           CAST(CAST(est.j_num AS HUGEINT) * est.union_est // est.k_used AS BIGINT) AS inter_est,
           CASE WHEN abs(CAST(CAST(est.j_num AS HUGEINT) * est.union_est // est.k_used AS BIGINT)
                         - exact.n_inter) * 4 <= exact.n_inter THEN 1 ELSE 0 END AS inter_within_25pct,
           CASE WHEN abs(est.union_est - exact.n_union) * 10 <= exact.n_union THEN 1 ELSE 0 END AS union_within_10pct
    FROM est, exact
"""


@query("sketch_kmv_intersection", oracle=_KMVI_ORACLE, tags=("sketch", "kmv", "cardinality"))
def sketch_kmv_intersection(spark, sf_dir):
    """KMV SET ALGEBRA (Beyer et al., SIGMOD 2007): estimate
    |A ∩ B|, |A ∪ B| and Jaccard from two bottom-k sketches alone —
    the join-cardinality estimator a CBO consults before picking a
    join strategy (complements the exact-count ANALYZE wiring in
    tests/test_cbo_stats.py with the O(k)-space path). A = customers
    with an 'F' order, B = customers with an 'O' order; K = bottom-k
    of A ∪ B (sketch merge = union, re-take k); ρ = |K ∩ A ∩ B|/k
    estimates Jaccard and |A∩B| ≈ ρ·|A∪B|_KMV — every step integer
    arithmetic over the portable md5 hashes (wide-int division for the
    union estimate, so the whole estimator is bit-exact vs DuckDB).
    Exact counts ride along; both error verdicts were confirmed 1 at
    sf0.001 and sf0.01 before pinning.

    Scale shape: per-set distinct hashing is map-heavy with partial
    agg; the bottom-k is TakeOrdered; membership marking is a
    broadcast of the 256-row sketch against the (already distinct)
    hash sets. Sketch space is O(k) however large the sets.
    """
    k = _KMVI_K
    scale = 1 << 60
    orders = t(spark, sf_dir, "orders")

    def hset(status):
        return (
            orders.where(F.col("o_orderstatus") == status)
            .select(
                F.conv(
                    F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
                )
                .cast("bigint")
                .alias("hv")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

    a, b = hset("F"), hset("O")
    u = a.unionByName(b).distinct().orderBy("hv").limit(k)
    kth = u.agg(F.max("hv").alias("kth_min"), F.count("*").cast("bigint").alias("k_used"))
    marked = (
        u.join(a.withColumn("ina", F.lit(1)), "hv", "left")
        .join(b.withColumn("inb", F.lit(1)), "hv", "left")
        .agg(
            F.sum(
                ((F.col("ina") == 1) & (F.col("inb") == 1)).cast("bigint")
            ).alias("j_num")
        )
    )
    exact = (
        a.agg(F.count("*").cast("bigint").alias("n_a"))
        .crossJoin(F.broadcast(b.agg(F.count("*").cast("bigint").alias("n_b"))))
        .crossJoin(
            F.broadcast(a.join(b, "hv").agg(F.count("*").cast("bigint").alias("n_inter")))
        )
        .crossJoin(
            F.broadcast(
                a.unionByName(b).distinct().agg(F.count("*").cast("bigint").alias("n_union"))
            )
        )
    )
    est = (
        exact.crossJoin(F.broadcast(marked))
        .crossJoin(F.broadcast(kth))
        .withColumn(
            "union_est",
            # unsaturated sketch (|A∪B| < k) holds the whole set: the
            # estimate IS the exact count (standard KMV small-set case)
            F.when(F.col("k_used") < k, F.col("k_used")).otherwise(
                F.expr(
                    f"CAST((CAST({k} - 1 AS DECIMAL(38,0)) * {scale}) div kth_min AS BIGINT)"
                )
            ),
        )
        .withColumn(
            "inter_est",
            F.expr("CAST((CAST(j_num AS DECIMAL(38,0)) * union_est) div k_used AS BIGINT)"),
        )
    )
    return est.select(
        "n_a", "n_b", "n_inter", "n_union", "j_num", "k_used", "union_est", "inter_est",
        F.when(F.abs(F.col("inter_est") - F.col("n_inter")) * 4 <= F.col("n_inter"), 1)
        .otherwise(0)
        .alias("inter_within_25pct"),
        F.when(F.abs(F.col("union_est") - F.col("n_union")) * 10 <= F.col("n_union"), 1)
        .otherwise(0)
        .alias("union_within_10pct"),
    )
