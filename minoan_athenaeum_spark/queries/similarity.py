"""Similarity-search queries over the embeddings table.

``sim_knn_cosine_brute`` is the oracle-checked correctness baseline
(quantized-int math ⇒ bit-exact vs DuckDB). The LSH/IVF variants are the
scale paths — driver rows-only check; recall pinned vs brute force in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.similarity import (
    cosine_q,
    quantize,
    sign_lsh_key,
)
from minoan_athenaeum_spark.queries._util import persist_tracked, release_tracked, t
from minoan_athenaeum_spark.registry import query

_QUANT = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"


@query(
    "sim_knn_cosine_brute",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    )
    SELECT n.vec_id AS nn_id,
           CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                        i -> n.q[i] * qv.q0[i])) AS DOUBLE)
             / (n.nrm * qv.nrm0) AS cos_sim
    FROM n, qv
    WHERE n.vec_id != 0
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
    """,
    tags=("similarity", "knn", "brute"),
)
def sim_knn_cosine_brute(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0. The query vector
    broadcasts (single-row cross join); scoring is a JVM map over all
    vectors + TakeOrdered — embarrassingly parallel, no shuffle of the
    corpus. This is the exact baseline the ANN variants are measured
    against."""
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    qv = v.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("q0")
    )
    scored = v.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
    return (
        scored.select(
            F.col("vec_id").alias("nn_id"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("nn_id"))
        .limit(10)
    )


@query("sim_ann_lsh_topk", tags=("similarity", "ann", "lsh"))
def sim_ann_lsh_topk(spark, sf_dir):
    """ANN top-10 for vec_id=0 via sign-LSH bucketing: score only vectors
    whose 8-bit hyperplane signature is within Hamming ≤ 2 of the query's
    (multi-probe). At scale the bucket key is the shuffle/partition key;
    scoring touches a small fraction of the corpus. Recall vs brute force
    is asserted in tests/test_similarity.py."""
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    keyed = v.select("vec_id", "q", sign_lsh_key(F.col("q"), 8).alias("lsh"))
    qv = keyed.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("q0"), F.col("lsh").alias("lsh0")
    )
    cand = keyed.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv)).filter(
        F.bit_count(
            F.col("lsh").bitwiseXOR(F.col("lsh0")).cast("bigint")
        )
        <= 2
    )
    return (
        cand.select(
            F.col("vec_id").alias("nn_id"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("nn_id"))
        .limit(10)
    )


@query("sim_ann_ivf_topk", tags=("similarity", "ann", "ivf"))
def sim_ann_ivf_topk(spark, sf_dir, n_cells: int = 8, nprobe: int = 3):
    """ANN top-10 for vec_id=0 via IVF-Flat: 8 seeded coarse centroids
    (vectors with the 8 smallest vec_ids — deterministic stand-in for a
    k-means codebook), every vector assigned to its nearest centroid,
    query probes its ``nprobe`` nearest cells only.

    At scale the cell id is the storage partition key, so a probe reads
    nprobe/n_cells of the corpus with no shuffle. On isotropic random
    data (this testdata) recall ≈ fraction probed — by design; real
    embedding corpora cluster, which is what makes IVF pay off. Recall
    vs brute force is pinned in tests/test_similarity.py.

    Centroid assignment is MAP-ONLY: the codebook collapses to a single
    broadcast row (array of (cell, centroid) structs) and each vector
    picks its argmax cell with an array ``aggregate`` expression — no
    explode, no per-vector window, zero shuffle of the corpus (the
    window formulation shuffled all vectors on vec_id)."""
    e = t(spark, sf_dir, "embeddings")
    release_tracked()
    v = persist_tracked(e.select("vec_id", quantize(F.col("embedding")).alias("q")))
    cents = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("q").alias("cq"))
    )
    codebook = cents.agg(
        F.collect_list(F.struct(F.col("cell"), F.col("cq"))).alias("cb")
    )
    # argmax over the codebook array: keep (cell, csim) in an
    # accumulator struct; ties prefer the smaller cell id, so the result
    # is independent of collect_list order.
    best = F.aggregate(
        F.col("cb"),
        F.struct(
            F.lit(-1).cast("long").alias("cell"),
            F.lit(float("-inf")).alias("csim"),
        ),
        lambda acc, c: F.when(
            (cosine_q(F.col("q"), c.cq) > acc.csim)
            | ((cosine_q(F.col("q"), c.cq) == acc.csim) & (c.cell < acc.cell)),
            F.struct(c.cell.alias("cell"), cosine_q(F.col("q"), c.cq).alias("csim")),
        ).otherwise(acc),
    )
    assigned = (
        v.crossJoin(F.broadcast(codebook))
        .select("vec_id", "q", best.getField("cell").alias("cell"))
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("q").alias("q0"))
    probe_cells = (
        cents.crossJoin(F.broadcast(qv))
        .select("cell", cosine_q(F.col("cq"), F.col("q0")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = assigned.filter(F.col("vec_id") != 0).join(
        F.broadcast(probe_cells), "cell"
    ).crossJoin(F.broadcast(qv))
    return (
        cand.select(
            F.col("vec_id").alias("nn_id"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("nn_id"))
        .limit(10)
    )


@query(
    "sim_label_centroid_top3",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, label, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    ), scored AS (
      SELECT n.label,
             n.vec_id,
             CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                          i -> n.q[i] * qv.q0[i])) AS DOUBLE)
               / (n.nrm * qv.nrm0) AS cos_sim
      FROM n, qv WHERE n.vec_id != 0
    )
    SELECT label, vec_id AS nn_id, cos_sim, rn FROM (
      SELECT label, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    tags=("similarity", "window"),
)
def sim_label_centroid_top3(spark, sf_dir):
    """Top-3 most-similar vectors to vec_id=0 within every label group
    (grouped k-NN — window over the scored corpus; one shuffle on
    label)."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", quantize(F.col("embedding")).alias("q"))
    qv = v.filter(F.col("vec_id") == 0).select(F.col("q").alias("q0"))
    scored = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "label",
            F.col("vec_id"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("label").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", F.col("vec_id").alias("nn_id"), "cos_sim", "rn")
    )
