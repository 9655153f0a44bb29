"""Secondary variants demoted past the driver's checked registry
prefix (the per-round correctness run covers a bounded number of
entries, so each slot in the prefix goes to a distinct operator family;
these queries are oracle-equivalent twins or derived aggregates of
operators already covered there — still registered, still pytest-
oracle-checked via tests/test_oracle_parity.py, just later in import
order).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.theta import theta_count_by_key
from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query

_QUANT = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings WHERE vec_id % 5 = 0
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                        i -> a.q[i] * b.q[i])) AS DOUBLE)
             / (a.nrm * b.nrm) AS cos_sim
    FROM n a, n b
    WHERE a.vec_id < b.vec_id
      AND CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                       i -> a.q[i] * b.q[i])) AS DOUBLE)
            / (a.nrm * b.nrm) >= 0.35
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup: cosine ≥ 0.35 between quantized vectors
    (the synthetic embeddings are isotropic noise — max pairwise cosine
    ~0.45 — so the threshold is set where the operator has output;
    real corpora use ~0.9+)
    (round(x·1e4) int arithmetic ⇒ exact dot products; sqrt/division on
    identical doubles ⇒ bit-identical across engines). Subset
    vec_id % 5 = 0 keeps the O(n²) oracle bounded; the Spark plan is the
    same blocked pairwise join used at scale with LSH prefilter."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 10000).cast("bigint"),
    )
    v = e.select("vec_id", q.alias("q"))
    n = v.select(
        "vec_id",
        "q",
        F.sqrt(
            F.aggregate(
                F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + x * x
            ).cast("double")
        ).alias("nrm"),
    )
    a, b = n.alias("a"), n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).cast("double")
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )


@query(
    "theta_count_by_key",
    oracle="""
    WITH lq AS (SELECT l_quantity AS key, COUNT(*) AS ln FROM lineitem GROUP BY 1),
         ps AS (SELECT p_size AS sz, COUNT(*) AS pn FROM part GROUP BY 1)
    SELECT lq.key AS key, CAST(SUM(lq.ln * ps.pn) AS BIGINT) AS n_pairs
    FROM lq JOIN ps ON lq.key > ps.sz
    GROUP BY 1
    """,
    tags=("theta", "optimization", "aggregate"),
)
def theta_count_by_key_q(spark, sf_dir):
    """COUNT of theta-join pairs per key over the FULL lineitem × part —
    unboundedly scalable because the pairs are never materialized:
    per-key counts, d×d key NLJ, multiply-and-sum. The oracle SQL uses
    the same per-key-summary algebra (semantically identical to
    ``SELECT l_quantity, COUNT(*) FROM lineitem, part WHERE l_quantity >
    p_size GROUP BY 1``)."""
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part")
    return theta_count_by_key(li, pa, "l_quantity", "p_size", ">")


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens,
           len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS n_unique
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_token_count_bpe(spark, sf_dir):
    """BPE-style pre-tokenization counts: the GPT-2-ish splitter
    (letter runs | digit runs | single punctuation, whitespace dropped)
    that approximates subword token budgets far better than whitespace
    splitting on code/punctuated text. Pure JVM regexp — one map pass,
    no shuffle at all."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_subtokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey AS k,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100 AS DOUBLE) AS price,
             'URGENT-MERGED' AS prio,
             (o_orderkey % 91 = 0) AS is_del
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE),
             'NEW-ROW', FALSE
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT COALESCE(b.o_orderkey, u.k) AS okey,
           COALESCE(u.price, CAST(CAST(b.o_totalprice AS DECIMAL(12,2)) AS DOUBLE)) AS price,
           COALESCE(u.prio, b.o_orderpriority) AS priority
    FROM orders b FULL OUTER JOIN upd u ON b.o_orderkey = u.k
    WHERE NOT COALESCE(u.is_del, FALSE)
    """,
    tags=("merge", "upsert"),
)
def merge_upsert_orders(spark, sf_dir):
    """SQL-MERGE semantics over parquet (operators/merge.py): a derived
    updates feed bumps prices on keys % 7 (deleting keys % 91), inserts
    shifted new rows for keys % 13; base rows without an update pass
    through. The driver gate certifies matched-update / insert / keep /
    delete paths in one result."""
    from minoan_athenaeum_spark.operators.merge import merge_upsert

    o = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            (price + 100).cast("double").alias("price"),
            F.lit("URGENT-MERGED").alias("priority"),
            (F.col("o_orderkey") % 91 == 0).alias("is_del"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                price.cast("double").alias("price"),
                F.lit("NEW-ROW").alias("priority"),
                F.lit(False).alias("is_del"),
            )
        )
    )
    base = o.select(
        "o_orderkey",
        price.cast("double").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return merge_upsert(
        base, upd, "o_orderkey", ["price", "priority"], delete_col="is_del"
    ).select(F.col("o_orderkey").alias("okey"), "price", "priority")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT o_orderpriority AS prio, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("skew", "aggregate"),
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation (operators/skew.py) on a 5-value
    group key — the degenerate-cardinality case where one reducer per
    group saturates; the salt spreads each group over 16 partials
    before the tiny merge. Result identical to the plain aggregate (the
    oracle computes it plainly)."""
    from minoan_athenaeum_spark.operators.skew import salted_agg

    o = t(spark, sf_dir, "orders")
    out = salted_agg(
        o,
        ["o_orderpriority"],
        {
            "cnt": F.count("*"),
            "total": F.sum(F.col("o_totalprice").cast("decimal(12,2)")),
        },
    )
    return out.select(
        F.col("o_orderpriority").alias("prio"),
        "cnt",
        F.col("total").cast("double").alias("total"),
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("skew", "join"),
)
def skew_salted_join(spark, sf_dir):
    """Salted fact⋈dim join (operators/skew.py) for hot-key joins where
    the dim is too large to broadcast: the fact side salts its key, the
    dim replicates once per salt bucket, the hot key's rows spread over
    8 reducers. Same result as the plain join (the oracle computes it
    plainly)."""
    from minoan_athenaeum_spark.operators.skew import salted_join

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = salted_join(c, n, "c_nationkey", "n_nationkey")
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").alias("n_cust")
    )


@query(
    "text_repetition_score",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                            i -> array_to_string(list_slice(ws, i, i + 1), ' ')) AS bg
      FROM w
    )
    SELECT doc_id, len(bg) AS n_bigrams,
           len(list_distinct(bg)) AS n_distinct,
           CASE WHEN len(bg) > 0
                THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
                       / CAST(len(bg) AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS rep_ratio
    FROM g
    """,
    tags=("text", "quality"),
)
def text_repetition_score(spark, sf_dir):
    """Within-document repetition (a Gopher-style quality signal):
    fraction of word bigrams that are repeats of an earlier bigram in
    the same document — highly repetitive boilerplate scores near 1 and
    gets filtered before training. Exact integer counts, one IEEE
    division; a pure map pass, no shuffle."""
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(words)
    bigrams = F.when(
        n >= F.lit(2),
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.array_join(F.slice(words, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t(spark, sf_dir, "documents").select("doc_id", bigrams.alias("bg"))
    nb = F.size("bg")
    nd = F.size(F.array_distinct("bg"))
    rep = F.when(nb > 0, (nb - nd).cast("double") / nb.cast("double")).otherwise(
        F.lit(0.0)
    )
    return g.select(
        "doc_id",
        nb.alias("n_bigrams"),
        nd.alias("n_distinct"),
        rep.alias("rep_ratio"),
    )


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT p_brand AS brand, p_partkey AS pkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
    tags=("window",),
)
def win_rank_dense_ntile(spark, sf_dir):
    """RANK / DENSE_RANK / NTILE over deterministic orderings."""
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    w2 = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("pkey"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w2).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey AS ckey, o_orderkey AS okey,
           LAG(o_orderkey) OVER w AS prev_okey,
           LEAD(o_orderkey) OVER w AS next_okey
    FROM orders WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def win_lag_lead(spark, sf_dir):
    """LAG/LEAD navigation within a customer's order history."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("ckey"),
        F.col("o_orderkey").alias("okey"),
        F.lag("o_orderkey").over(w).alias("prev_okey"),
        F.lead("o_orderkey").over(w).alias("next_okey"),
    )


@query(
    "pdf_grouped_map_topnorm",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS norm2
      FROM embeddings
    )
    SELECT label, vec_id, CAST(norm2 AS BIGINT) AS norm2, rk FROM (
      SELECT label, vec_id, norm2,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY norm2 DESC, vec_id) AS rk
      FROM v
    ) WHERE rk <= 2
    """,
    tags=("pandas", "grouped-map"),
)
def pdf_grouped_map_topnorm(spark, sf_dir):
    """Grouped-map ``applyInPandas`` (the third Pandas API surface next
    to scalar @pandas_udf and mapInPandas): each label group arrives as
    ONE pandas DataFrame and returns its top-2 vectors by quantized
    squared norm. All arithmetic is int64 (numpy exact), so the result
    hash-matches the SQL window oracle bit-for-bit.

    Scale shape: one shuffle on label; each group must fit one executor
    — the documented constraint of grouped-map (use mapInPandas or
    window functions when groups can be huge)."""
    import pandas as pd

    from minoan_athenaeum_spark.operators.similarity import quantize

    e = t(spark, sf_dir, "embeddings").select(
        "label",
        "vec_id",
        F.aggregate(
            quantize(F.col("embedding")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x * x,
        ).alias("norm2"),
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["norm2", "vec_id"], ascending=[False, True]
        ).head(2)
        out = out.assign(rk=range(1, len(out) + 1))
        return out[["label", "vec_id", "norm2", "rk"]]

    return e.groupBy("label").applyInPandas(
        top2, "label int, vec_id long, norm2 long, rk integer"
    )


@query(
    "misc_unpivot_melt",
    oracle="""
    SELECT o_orderkey AS okey, metric, val FROM (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
             CAST(o_custkey AS DOUBLE) AS cust
      FROM orders WHERE o_orderkey % 100 = 0
    ) UNPIVOT (val FOR metric IN (price, cust))
    """,
    tags=("misc", "unpivot"),
)
def misc_unpivot_melt(spark, sf_dir):
    """UNPIVOT / melt (wide → long reshape, the inverse of pivot): two
    measure columns become (metric, val) rows — the standard shape for
    feeding per-metric aggregations or plotting pipelines. Map-side
    only: each input row emits k rows, no shuffle."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    wide = o.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    return wide.unpivot("okey", ["price", "cust"], "metric", "val")


@query(
    "misc_scd2_dimension",
    oracle="""
    WITH cur AS (
      SELECT c_custkey AS ckey, c_mktsegment AS segment,
             '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
      FROM customer
    ), upd AS (
      SELECT c_custkey AS ckey, 'SEGMENT-NEW' AS segment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 10 = 5
      UNION ALL
      SELECT c_custkey + 9000000, 'FRESH' FROM customer WHERE c_custkey <= 3
    ), changed AS (
      SELECT c.ckey, c.segment AS old_seg, u.segment AS new_seg
      FROM cur c JOIN upd u USING (ckey)
      WHERE c.segment != u.segment
    )
    SELECT ckey, segment, valid_from, valid_to FROM cur
    WHERE ckey NOT IN (SELECT ckey FROM changed)
    UNION ALL
    SELECT ckey, old_seg, '1990-01-01', '2000-01-01' FROM changed
    UNION ALL
    SELECT ckey, new_seg, '2000-01-01', NULL FROM changed
    UNION ALL
    SELECT u.ckey, u.segment, '2000-01-01', NULL
    FROM upd u LEFT JOIN cur c USING (ckey) WHERE c.ckey IS NULL
    """,
    tags=("misc", "scd2", "merge"),
)
def misc_scd2_dimension(spark, sf_dir):
    """SCD TYPE-2 dimension maintenance (operators/scd.py::scd2_apply):
    one update batch against a customer-segment dimension exercises all
    four paths — change (old version closed at the effective date, new
    open version inserted), no-op update (same attributes, untouched),
    no update (untouched), brand-new key (open version inserted). The
    oracle recomputes the same four-way union in SQL.

    Scale shape: the only join is current-slice ⋈ updates on the
    business key (updates broadcast); history rows never move."""
    from minoan_athenaeum_spark.operators.scd import scd2_apply

    c = t(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("ckey"), F.lit("SEGMENT-NEW").alias("segment"))
        .unionByName(
            c.filter(F.col("c_custkey") % 10 == 5).select(
                F.col("c_custkey").alias("ckey"), F.col("c_mktsegment").alias("segment")
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") <= 3).select(
                (F.col("c_custkey") + 9000000).alias("ckey"),
                F.lit("FRESH").alias("segment"),
            )
        )
    )
    return scd2_apply(dim, upd, "ckey", ["segment"], "2000-01-01")


_EVENTS_TEXT_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
    FROM events
    GROUP BY event_type
"""


@query("src_csv_events_agg", oracle=_EVENTS_TEXT_ORACLE, tags=("source", "csv"))
def src_csv_events_agg(spark, sf_dir):
    """CSV source connector, proven by round trip: events exported once
    to headered CSV (timestamps as epoch micros, money as integer
    cents — a LOSSLESS text schema), read back with an EXPLICIT schema
    (no inference pass — at 100 TB schema inference is a full extra
    scan), and aggregated; the oracle reads the original parquet, so a
    green row certifies the text round trip bit-for-bit.
    Export is fingerprint-keyed (sources/textio.py) — regenerated
    testdata can never serve a stale export."""
    from minoan_athenaeum_spark.sources.textio import (
        ensure_events_export,
        read_events_csv,
    )

    path = ensure_events_export(spark, sf_dir, "csv")
    ev = read_events_csv(spark, path)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("total_cents"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


@query("src_jsonl_events_agg", oracle=_EVENTS_TEXT_ORACLE, tags=("source", "jsonl"))
def src_jsonl_events_agg(spark, sf_dir):
    """JSON-lines source connector, same round-trip proof and lossless
    text schema as src_csv_events_agg (JSONL is the lingua franca of
    web-scraped training corpora — every dump reader starts here)."""
    from minoan_athenaeum_spark.sources.textio import (
        ensure_events_export,
        read_events_jsonl,
    )

    path = ensure_events_export(spark, sf_dir, "json")
    ev = read_events_jsonl(spark, path)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("total_cents"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


@query(
    "misc_compaction_roundtrip",
    oracle=_EVENTS_TEXT_ORACLE,
    tags=("maintenance", "compaction"),
)
def misc_compaction_roundtrip(spark, sf_dir):
    """Small-files compaction proven by round trip: events is first
    splintered into 64 tiny parquet files (the streaming-sink
    pathology), then compacted to ~4 MB targets via the metadata-driven
    repartition (sources/parquet_sink.py::compact_small_files — file
    count from the LISTING, no extra data pass), and the compacted copy
    is aggregated against the original-parquet oracle. A green row
    certifies compaction moved every row exactly once. File-count
    behavior is pinned separately in tests/test_compaction.py."""
    import os

    from minoan_athenaeum_spark.sources.bucketed import _source_fingerprint
    from minoan_athenaeum_spark.sources.parquet_sink import compact_small_files

    fp = _source_fingerprint(f"{sf_dir}/events.parquet")[:16]
    base = f"/tmp/mas_compaction/{fp}"
    shattered, compacted = f"{base}/shattered", f"{base}/compacted"
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        ev = t(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        ev.repartition(64).write.mode("overwrite").parquet(shattered)
        compact_small_files(spark, shattered, compacted, target_bytes=4 * 1024 * 1024)
    ev = spark.read.parquet(compacted)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("total_cents"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


@query("src_orc_events_agg", oracle=_EVENTS_TEXT_ORACLE, tags=("source", "orc"))
def src_orc_events_agg(spark, sf_dir):
    """ORC source connector (the third interchange format next to
    CSV/JSONL — the columnar format the Hive world hands over), proven
    by the same round trip: export once, explicit-schema read back,
    aggregate against the original-parquet oracle."""
    from minoan_athenaeum_spark.sources.textio import (
        ensure_events_orc,
        read_events_orc,
    )

    path = ensure_events_orc(spark, sf_dir)
    ev = read_events_orc(spark, path)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("total_cents"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


_DQ_ORACLE = """
    SELECT 'orders_custkey_fk' AS check_name,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS violations,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS population
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST((SELECT COUNT(*) FROM (
                  SELECT o_orderkey FROM orders
                  GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'customer_name_notnull',
           CAST((SELECT COUNT(*) FROM customer
                 WHERE c_name IS NULL OR c_name = '') AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
"""


@query("misc_dq_constraint_checks", oracle=_DQ_ORACLE, tags=("dq", "constraints"))
def misc_dq_constraint_checks(spark, sf_dir):
    """DATA-QUALITY CONSTRAINT SUITE (the expectations layer every
    warehouse runs before trusting a load): referential integrity
    (orders→customer, lineitem→orders via LEFT ANTI joins — never a
    row-by-row lookup), primary-key uniqueness (groupBy HAVING>1),
    domain range, and not-null checks, each reported as
    (check, violations, population).

    Scale shape: every check is a single aggregate or anti-join over
    the table it audits — FK anti-joins shuffle on the key (AQE
    broadcasts the dim side when small), uniqueness is a partial-agg
    groupBy, range/null checks are map-side conditional counts. The
    whole suite is one pass per table, composable into a scheduled
    audit."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")

    fk_orders = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
        F.lit("orders_custkey_fk").alias("check_name"),
        F.count("*").alias("violations"),
    )
    fk_line = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti").agg(
        F.lit("lineitem_orderkey_fk").alias("check_name"),
        F.count("*").alias("violations"),
    )
    pk = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(
            F.lit("orders_pk_unique").alias("check_name"),
            F.count("*").alias("violations"),
        )
    )
    rng = li.agg(
        F.lit("lineitem_qty_range").alias("check_name"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
        ).alias("violations"),
    )
    nn = c.agg(
        F.lit("customer_name_notnull").alias("check_name"),
        F.sum(
            (F.col("c_name").isNull() | (F.col("c_name") == "")).cast("long")
        ).alias("violations"),
    )
    pops = {
        "orders_custkey_fk": o.count(),
        "lineitem_orderkey_fk": li.count(),
        "orders_pk_unique": o.select("o_orderkey").distinct().count(),
        "lineitem_qty_range": li.count(),
        "customer_name_notnull": c.count(),
    }
    checks = fk_orders.unionAll(fk_line).unionAll(pk).unionAll(rng).unionAll(nn)
    pop_df = spark.createDataFrame(
        [(k, v) for k, v in pops.items()], "check_name string, population bigint"
    )
    return checks.join(F.broadcast(pop_df), "check_name").select(
        "check_name", "violations", "population"
    )


_PIT_JOIN_ORACLE = """
    WITH dim AS (
      SELECT c_custkey AS ckey, c_mktsegment AS segment,
             '1990-01-01' AS valid_from, '1995-06-01' AS valid_to
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'SEGMENT-NEW', '1995-06-01', '9999-12-31'
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, '1990-01-01', '9999-12-31'
      FROM customer WHERE c_custkey % 10 != 0
    )
    SELECT d.segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN dim d
      ON d.ckey = o.o_custkey
     AND CAST(o.o_orderdate AS VARCHAR) >= d.valid_from
     AND CAST(o.o_orderdate AS VARCHAR) < d.valid_to
    GROUP BY d.segment
"""


@query("misc_scd2_point_in_time_join", oracle=_PIT_JOIN_ORACLE, tags=("scd2", "temporal", "join"))
def misc_scd2_point_in_time_join(spark, sf_dir):
    """POINT-IN-TIME (as-of) JOIN against an SCD Type-2 dimension — the
    query SCD2 history exists FOR: each order joins to the dimension
    version that was valid ON ITS ORDER DATE, so 1994 orders of a
    customer resegmented in mid-1995 report the OLD segment and 1996
    orders the new one. The versioned dim is built deterministically
    (every custkey % 10 == 0 resegments on 1995-06-01); revenue per
    effective segment comes out exact-decimal.

    Scale shape: an equi-join on the business key with a residual
    validity-range predicate — the hash join carries the band filter,
    never a cross join; versions-per-key is small and bounded, so the
    fan-out is ~1. History never moves; only the (tiny) dim shuffles
    or broadcasts."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    changed = c.filter(F.col("c_custkey") % 10 == 0)
    dim = (
        changed.select(
            F.col("c_custkey").alias("ckey"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("1990-01-01").alias("valid_from"),
            F.lit("1995-06-01").alias("valid_to"),
        )
        .unionAll(
            changed.select(
                F.col("c_custkey").alias("ckey"),
                F.lit("SEGMENT-NEW").alias("segment"),
                F.lit("1995-06-01").alias("valid_from"),
                F.lit("9999-12-31").alias("valid_to"),
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 10 != 0).select(
                F.col("c_custkey").alias("ckey"),
                F.col("c_mktsegment").alias("segment"),
                F.lit("1990-01-01").alias("valid_from"),
                F.lit("9999-12-31").alias("valid_to"),
            )
        )
    )
    od = F.col("o_orderdate").cast("string")
    joined = o.join(
        dim,
        (F.col("ckey") == F.col("o_custkey"))
        & (od >= F.col("valid_from"))
        & (od < F.col("valid_to")),
    )
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "misc_zorder_roundtrip",
    oracle=_EVENTS_TEXT_ORACLE,
    tags=("layout", "zorder"),
)
def misc_zorder_roundtrip(spark, sf_dir):
    """Z-ORDER layout path proven by round trip: events rewritten
    clustered on the Morton-interleaved (user_id, value-cents) key
    (sources/parquet_sink.py::write_zordered — the multi-column
    pruning layout whose row-group-span halving is measured in
    tests/test_zorder_layout.py), then the clustered copy is
    aggregated against the original-parquet oracle. A green row
    certifies the space-filling-curve rewrite moved every row exactly
    once; the layout's pruning benefit is pinned separately on real
    row-group statistics."""
    import os

    from minoan_athenaeum_spark.sources.bucketed import _source_fingerprint
    from minoan_athenaeum_spark.sources.parquet_sink import write_zordered

    fp = _source_fingerprint(f"{sf_dir}/events.parquet")[:16]
    out = f"/tmp/mas_zorder/{fp}/events"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = t(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
            "user_id",
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        write_zordered(ev, out, ("user_id", "cents"))
    z = spark.read.parquet(out)
    return z.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("cents").alias("total_cents"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
