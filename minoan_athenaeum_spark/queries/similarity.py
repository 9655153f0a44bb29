"""Similarity-search queries over the embeddings table.

``sim_knn_cosine_brute`` is the oracle-checked correctness baseline
(quantized-int math ⇒ bit-exact vs DuckDB). The LSH/IVF variants are
the scale paths; both are deterministic (portable-hash hyperplane
weights / seeded centroids with exact tie-breaks), so each has an exact
same-pipeline DuckDB oracle twin, plus recall-vs-brute pins in
tests/test_dedup_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.similarity import (
    cosine_q,
    kmeans_refine,
    nearest_cell,
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


@query(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), sigs AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm,
             CAST(list_sum(list_transform(range(0, 8), i ->
               CASE WHEN list_sum(list_transform(range(1, len(q) + 1), j ->
                      CASE WHEN (CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '_'
                                         || CAST(j - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1
                           THEN q[j] ELSE -q[j] END)) > 0
                    THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lsh
      FROM v
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0, lsh AS lsh0 FROM sigs WHERE vec_id = 0
    )
    SELECT s.vec_id AS nn_id,
           CAST(list_sum(list_transform(range(1, len(s.q) + 1),
                                        i -> s.q[i] * qv.q0[i])) AS DOUBLE)
             / (s.nrm * qv.nrm0) AS cos_sim
    FROM sigs s, qv
    WHERE s.vec_id != 0
      AND bit_count(xor(s.lsh, qv.lsh0)) <= 2
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "lsh"),
)
def sim_ann_lsh_topk(spark, sf_dir):
    """ANN top-10 for vec_id=0 via sign-LSH bucketing: score only vectors
    whose 8-bit hyperplane signature is within Hamming ≤ 2 of the query's
    (multi-probe). At scale the bucket key is the shuffle/partition key;
    scoring touches a small fraction of the corpus.

    Oracle: the SAME deterministic probe in DuckDB — hyperplane weights
    are the parity of the portable md5-derived hash of (bit, dim), so
    signatures, the Hamming≤2 candidate set, and the scored top-10 are
    bit-identical by construction. Recall vs brute force is separately
    asserted in tests/test_dedup_similarity.py."""
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


@query(
    "sim_ann_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), cents AS (
      SELECT vec_id AS cell, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8
    ), scored AS (
      SELECT n.vec_id, cents.cell,
             CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                          i -> n.q[i] * cents.cq[i])) AS DOUBLE)
               / (n.nrm * cents.cnrm) AS csim
      FROM n, cents
    ), assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell) AS rn
        FROM scored
      ) WHERE rn = 1
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    ), probe AS (
      SELECT cell FROM (
        SELECT cents.cell,
               CAST(list_sum(list_transform(range(1, len(cents.cq) + 1),
                                            i -> cents.cq[i] * qv.q0[i])) AS DOUBLE)
                 / (cents.cnrm * qv.nrm0) AS csim
        FROM cents, qv
      ) ORDER BY csim DESC, cell LIMIT 3
    )
    SELECT n.vec_id AS nn_id,
           CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                        i -> n.q[i] * qv.q0[i])) AS DOUBLE)
             / (n.nrm * qv.nrm0) AS cos_sim
    FROM n
    JOIN assigned a ON n.vec_id = a.vec_id
    JOIN probe p ON a.cell = p.cell, qv
    WHERE n.vec_id != 0
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ann_ivf_topk(spark, sf_dir, n_cells: int = 8, nprobe: int = 3):
    """ANN top-10 for vec_id=0 via IVF-Flat: 8 seeded coarse centroids
    (vectors with the 8 smallest vec_ids — deterministic stand-in for a
    k-means codebook), every vector assigned to its nearest centroid,
    query probes its ``nprobe`` nearest cells only.

    At scale the cell id is the storage partition key, so a probe reads
    nprobe/n_cells of the corpus with no shuffle. On isotropic random
    data (this testdata) recall ≈ fraction probed — by design; real
    embedding corpora cluster, which is what makes IVF pay off. Recall
    vs brute force is pinned in tests/test_dedup_similarity.py.

    Oracle: the same deterministic pipeline in DuckDB — centroid
    assignment as a window with the identical (csim DESC, cell)
    tie-break, probe-cell selection, and quantized-int cosine scoring
    are all bit-exact across engines, so the top-10 matches exactly.

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
    best = nearest_cell(F.col("q"), F.col("cb"))
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


def _ivf_kmeans_oracle(dim: int = 64, n_cells: int = 8, iters: int = 2, nprobe: int = 3) -> str:
    """Unrolled-Lloyd DuckDB twin of sim_ann_ivf_kmeans_topk. Each
    iteration mirrors the Spark pipeline exactly: argmax-cosine
    assignment (ROW_NUMBER with the same (csim DESC, cell) tie-break),
    per-cell per-dim integer SUM + COUNT, centroid = floor(s/c + 0.5) —
    every number bit-identical across engines."""
    cnorm = "sqrt(CAST(list_sum(list_transform(c.cq, x -> x * x)) AS DOUBLE))"
    parts = [
        f"WITH v AS (SELECT vec_id, {_QUANT} AS q FROM embeddings)",
        """n AS (
          SELECT vec_id, q,
                 sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
          FROM v)""",
        f"cents0 AS (SELECT vec_id AS cell, q AS cq FROM v WHERE vec_id < {n_cells})",
    ]
    for k in range(1, iters + 1):
        prev = f"cents{k - 1}"
        parts += [
            f"""scored{k} AS (
              SELECT n.vec_id, c.cell,
                     CAST(list_sum(list_transform(range(1, {dim} + 1),
                                                  i -> n.q[i] * c.cq[i])) AS DOUBLE)
                       / (n.nrm * {cnorm}) AS csim
              FROM n, {prev} c)""",
            f"""assigned{k} AS (
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY csim DESC, cell) AS rn
                FROM scored{k}) WHERE rn = 1)""",
            f"""sums{k} AS (
              SELECT a.cell, t.i, SUM(n.q[t.i]) AS s
              FROM assigned{k} a JOIN n USING (vec_id), range(1, {dim} + 1) t(i)
              GROUP BY a.cell, t.i)""",
            f"""cnt{k} AS (SELECT cell, COUNT(*) AS c FROM assigned{k} GROUP BY cell)""",
            f"""cents{k} AS (
              SELECT s.cell,
                     list(CAST(floor(CAST(s.s AS DOUBLE) / cnt{k}.c + 0.5) AS BIGINT)
                          ORDER BY s.i) AS cq
              FROM sums{k} s JOIN cnt{k} USING (cell)
              GROUP BY s.cell)""",
        ]
    last = f"cents{iters}"
    parts += [
        "qv AS (SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0)",
        f"""fin_assigned AS (
          SELECT vec_id, cell FROM (
            SELECT n.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                     CAST(list_sum(list_transform(range(1, {dim} + 1),
                                                  i -> n.q[i] * c.cq[i])) AS DOUBLE)
                       / (n.nrm * {cnorm}) DESC, c.cell) AS rn
            FROM n, {last} c) WHERE rn = 1)""",
        f"""probe AS (
          SELECT cell FROM (
            SELECT c.cell,
                   CAST(list_sum(list_transform(range(1, {dim} + 1),
                                                i -> c.cq[i] * qv.q0[i])) AS DOUBLE)
                     / ({cnorm} * qv.nrm0) AS csim
            FROM {last} c, qv)
          ORDER BY csim DESC, cell LIMIT {nprobe})""",
    ]
    return (
        ",\n".join(parts)
        + f"""
    SELECT n.vec_id AS nn_id,
           CAST(list_sum(list_transform(range(1, {dim} + 1),
                                        i -> n.q[i] * qv.q0[i])) AS DOUBLE)
             / (n.nrm * qv.nrm0) AS cos_sim
    FROM n
    JOIN fin_assigned a ON n.vec_id = a.vec_id
    JOIN probe p ON a.cell = p.cell, qv
    WHERE n.vec_id != 0
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
    """
    )


@query(
    "sim_ann_ivf_kmeans_topk",
    oracle=_ivf_kmeans_oracle(),
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def sim_ann_ivf_kmeans_topk(spark, sf_dir, n_cells: int = 8, nprobe: int = 3):
    """ANN top-10 for vec_id=0 via IVF-Flat with a k-means-REFINED
    codebook: the 8 seeded centroids of sim_ann_ivf_topk are improved by
    two Lloyd iterations (operators.similarity.kmeans_refine) before
    assignment and probing. On clustered corpora — every real embedding
    corpus — refinement aligns cells with the density modes, so recall
    at the same nprobe/n_cells scan fraction rises well above the
    fraction-probed baseline (pinned in tests/test_dedup_similarity.py
    on a clustered synthetic set).

    Scale shape: each Lloyd round and the final assignment are map-only
    Arrow-vectorized passes (operators.similarity.arrow_assigner —
    int64-matmul cosine, bit-identical to the JVM fold but C-speed) plus
    an n_cells×dim-number shuffle for the per-cell sums; the corpus
    itself never shuffles, same as the final probe.

    Oracle: the identical unrolled pipeline in DuckDB — integer sums,
    floor(s/c + 0.5) re-quantized means, and the (csim DESC, cell)
    tie-break make every intermediate bit-exact across engines."""
    e = t(spark, sf_dir, "embeddings")
    release_tracked()
    v = persist_tracked(e.select("vec_id", quantize(F.col("embedding")).alias("q")))
    seed = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("q").alias("cq"))
    )
    cents = kmeans_refine(v.select("q"), seed, dim=64, iters=2)
    from minoan_athenaeum_spark.operators.similarity import arrow_assigner

    cent_rows = [(int(r["cell"]), [int(x) for x in r["cq"]]) for r in cents.collect()]
    assign = arrow_assigner(cent_rows)
    assigned = v.select("vec_id", "q", assign(F.col("q")).alias("cell"))
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


@query(
    "sim_semdedup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), cents AS (
      SELECT vec_id AS cell, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8
    ), scored AS (
      SELECT n.vec_id, cents.cell,
             CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                          i -> n.q[i] * cents.cq[i])) AS DOUBLE)
               / (n.nrm * cents.cnrm) AS csim
      FROM n, cents
    ), assigned AS (
      SELECT vec_id, cell, csim FROM (
        SELECT vec_id, cell, csim,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell) AS rn
        FROM scored
      ) WHERE rn = 1
    ), keeper AS (
      SELECT cell, vec_id AS keeper_id FROM (
        SELECT cell, vec_id,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY csim DESC, vec_id) AS rn
        FROM assigned
      ) WHERE rn = 1
    )
    SELECT a.cell AS cell, COUNT(*) AS n_members,
           MIN(k.keeper_id) AS keeper_id, MIN(a.csim) AS min_sim
    FROM assigned a JOIN keeper k ON a.cell = k.cell
    GROUP BY a.cell
    """,
    tags=("similarity", "semdedup"),
)
def sim_semdedup(spark, sf_dir):
    """SemDedup-shaped semantic clustering pass: assign every embedding
    to its nearest of 8 fixed centroids (vec_id < 8 as the stand-in
    codebook — a real run would k-means a sample), then per cluster keep
    ONE representative (highest centroid similarity, ties to the lower
    vec_id) and report cluster size and the worst member similarity.
    Downstream, a pipeline drops everything but the keepers — dedup by
    semantic neighborhood rather than by text overlap.

    Scale shape: assignment is the MAP-ONLY broadcast-codebook argmax
    (operators.similarity.nearest_cell) — the corpus never shuffles for
    it; the only shuffle is the per-cell aggregate, keyed on the 8-value
    cell id (max_by/count partials combine map-side)."""
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    cents = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("q").alias("cq")
    )
    codebook = cents.agg(
        F.collect_list(F.struct(F.col("cell"), F.col("cq"))).alias("cb")
    )
    best = nearest_cell(F.col("q"), F.col("cb"))
    assigned = v.crossJoin(F.broadcast(codebook)).select(
        "vec_id",
        best.getField("cell").alias("cell"),
        best.getField("csim").alias("csim"),
    )
    return assigned.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.max_by(
            F.col("vec_id"), F.struct(F.col("csim"), (-F.col("vec_id")).alias("nid"))
        ).alias("keeper_id"),
        F.min("csim").alias("min_sim"),
    )


_PQ_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), cb AS (
      SELECT ms.m, v.vec_id AS code,
             v.q[ms.m * 8 + 1 : ms.m * 8 + 8] AS cvec
      FROM v, (SELECT unnest(range(0, 8)) AS m) ms
      WHERE v.vec_id < 16
    ), dists AS (
      SELECT v.vec_id, cb.m, cb.code,
             list_sum(list_transform(range(1, 9),
               i -> (v.q[cb.m * 8 + i] - cb.cvec[i])
                    * (v.q[cb.m * 8 + i] - cb.cvec[i]))) AS dist
      FROM v, cb
    ), enc AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM dists
      ) WHERE rn = 1
    ), qtab AS (
      SELECT m, code, dist FROM dists WHERE vec_id = 0
    ), adc AS (
      SELECT e.vec_id, SUM(qt.dist) AS adc_dist
      FROM enc e JOIN qtab qt ON e.m = qt.m AND e.code = qt.code
      WHERE e.vec_id != 0
      GROUP BY e.vec_id
    ), top AS (
      SELECT vec_id, adc_dist FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    )
    SELECT t.vec_id AS nn_id,
           CAST(t.adc_dist AS BIGINT) AS adc_dist,
           CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                        i -> n.q[i] * qv.q0[i])) AS DOUBLE)
             / (n.nrm * qv.nrm0) AS cos_sim
    FROM top t JOIN n ON t.vec_id = n.vec_id, qv
"""


@query(
    "sim_ann_pq_adc_topk",
    oracle=_PQ_ORACLE,
    tags=("similarity", "ann", "pq"),
)
def sim_ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (PQ + asymmetric distance computation):
    the 64-dim corpus is split into M=8 subspaces of 8 dims; each
    subspace gets a K=16 codebook (seeded from the first 16 vectors —
    the same seeding discipline as sim_ann_ivf_topk, so the pipeline is
    fully deterministic); every vector is encoded to 8 sub-codes
    (argmin integer L2, Arrow-batched numpy, operators.similarity.
    pq_encoder); the query's ADC table — its integer L2 distance to all
    M·K centroids — is a driver-side model artifact folded into a
    literal lookup expression; approximate distance is the table-lookup
    sum over codes (pure JVM, codegen), and the top-10 by (adc, vec_id)
    are exact-rescored with quantized-int cosine.

    Why it matters at 100 TB: codes are 8 BYTES per vector vs 256 for
    the raw floats — a 32× smaller scan for the candidate sweep, the
    memory-bandwidth win PQ exists for. Composing with the IVF coarse
    stage (sim_ann_ivf_kmeans_topk) gives the standard IVFADC layout;
    both stages are map-only over the corpus.

    Oracle: the identical pipeline in DuckDB — integer sub-distances,
    (dist, code) tie-breaks, integer ADC sums — bit-exact end to end;
    the only doubles are the final cosines, computed with the same
    expression shape as every other similarity oracle. Recall vs brute
    is pinned in tests/test_dedup_similarity.py."""
    import numpy as np

    from minoan_athenaeum_spark.operators.similarity import pq_encoder

    e = t(spark, sf_dir, "embeddings")
    release_tracked()
    v = persist_tracked(
        e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    )
    # Bounded model artifacts: 16 seed vectors (codebooks) + the query.
    seed_rows = {
        int(r["vec_id"]): [int(x) for x in r["q"]]
        for r in v.filter(F.col("vec_id") < 16).collect()
    }
    q0 = seed_rows[0]
    CB = np.array(
        [[seed_rows[c][s * 8 : (s + 1) * 8] for c in range(16)] for s in range(8)],
        dtype=np.int64,
    )  # (M=8, K=16, 8)
    q0_np = np.array(q0, dtype=np.int64)
    # ADC table: query sub-distance to every centroid — ints, exact.
    tab = [
        [int(((q0_np[s * 8 : (s + 1) * 8] - CB[s][c]) ** 2).sum()) for c in range(16)]
        for s in range(8)
    ]
    enc = pq_encoder(CB)
    coded = v.select("vec_id", "q", enc(F.col("q")).alias("codes"))
    adc = None
    for s in range(8):
        term = F.element_at(
            F.array(*[F.lit(x) for x in tab[s]]),
            F.col("codes").getItem(s).cast("int") + 1,
        )
        adc = term if adc is None else adc + term
    top = (
        coded.filter(F.col("vec_id") != 0)
        .select("vec_id", "q", adc.cast("bigint").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("q").alias("q0"))
    return top.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("nn_id"),
        "adc_dist",
        cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion (BM25 ⊕ embedding cosine)
# ---------------------------------------------------------------------------

_RRF_K = 60          # standard RRF dampening constant
_RRF_LEG = 50        # per-leg candidate list length
_RRF_OUT = 20


def _rrf_oracle() -> str:
    from minoan_athenaeum_spark.queries.text import bm25_cte

    return f"""
    WITH {bm25_cte()}, lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r
      FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT {_RRF_LEG}
    ), v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    ), cos AS (
      SELECT n.vec_id AS doc_id,
             CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                          i -> n.q[i] * qv.q0[i])) AS DOUBLE)
               / (n.nrm * qv.nrm0) AS cos_sim
      FROM n, qv
      WHERE n.vec_id != 0
    ), sem AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS r
      FROM cos ORDER BY cos_sim DESC, doc_id LIMIT {_RRF_LEG}
    ), fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(l.r, CAST(-1 AS BIGINT)) AS lex_rank,
             coalesce(s.r, CAST(-1 AS BIGINT)) AS sem_rank,
             coalesce(1.0 / ({_RRF_K} + l.r), 0.0)
               + coalesce(1.0 / ({_RRF_K} + s.r), 0.0) AS rrf
      FROM lex l FULL OUTER JOIN sem s USING (doc_id)
    )
    SELECT doc_id, lex_rank, sem_rank, rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {_RRF_OUT}
    """


@query("sim_hybrid_rrf", oracle=_rrf_oracle(), tags=("similarity", "search", "hybrid"))
def sim_hybrid_rrf(spark, sf_dir):
    """HYBRID RETRIEVAL via Reciprocal Rank Fusion (Cormack et al.
    2009): fuse the lexical BM25 top-50 (queries/text.py::bm25_per_doc,
    fixed demo terms) with the semantic embedding-cosine top-50
    (neighbors of vec_id=0, the quantized-int exact cosine of
    sim_knn_cosine_brute) by rrf = 1/(60+r_lex) + 1/(60+r_sem) — the
    standard two-tower search stack (sparse + dense) as one
    oracle-gated query. Absent-leg ranks surface as -1 and contribute
    0, so the gate pins exactly which leg proposed each result.

    Every score is a two-term sum of exact double reciprocals in fixed
    order — engine-portable, no transcendentals.

    Scale shape: each leg ends in TakeOrderedAndProject(50) BEFORE any
    window — the global row_number runs over 50 rows, not the corpus
    (a bounded single partition by construction, not a single-reducer
    corpus sort). The fusion join touches ≤100 rows. Corpus-sized work
    is exactly the two legs' scans, both shuffle-light (BM25: matched
    terms only; cosine: broadcast query vector, no shuffle at all).
    """
    from pyspark.sql import Window

    from minoan_athenaeum_spark.queries.text import bm25_per_doc

    lex_top = (
        bm25_per_doc(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_LEG)
    )
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("bigint").alias("r")
    )

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    qv = v.filter(F.col("vec_id") == 0).select(F.col("q").alias("q0"))
    cos = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
    )
    sem_top = cos.orderBy(F.col("cos_sim").desc(), "doc_id").limit(_RRF_LEG)
    w_sem = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    sem = sem_top.select(
        "doc_id", F.row_number().over(w_sem).cast("bigint").alias("r")
    )

    # both legs are ≤50 rows post-TakeOrdered: coalesce(1) keeps the
    # full-outer fusion join from fanning out to shuffle-partition
    # granularity (full outer can't broadcast)
    fused = (
        lex.coalesce(1).withColumnRenamed("r", "lr")
        .join(sem.coalesce(1).withColumnRenamed("r", "sr"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("lr"), F.lit(-1).cast("bigint")).alias("lex_rank"),
            F.coalesce(F.col("sr"), F.lit(-1).cast("bigint")).alias("sem_rank"),
            (
                F.coalesce(1.0 / (_RRF_K + F.col("lr")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sr")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_OUT)


# ---------------------------------------------------------------------------
# Per-label centroid alignment (embedding-space cluster cohesion)
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, label, {_QUANT} AS q FROM embeddings
    ), ex AS (
      SELECT label, i AS pos, q[i] AS x, vec_id
      FROM v, UNNEST(range(1, len(q) + 1)) AS u(i)
    ), sums AS (
      SELECT label, pos, CAST(sum(x) AS BIGINT) AS s FROM ex GROUP BY 1, 2
    ), counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1
    ), cent AS (
      SELECT s.label, list(CAST(floor(CAST(s.s AS DOUBLE) / c.n) AS BIGINT) ORDER BY s.pos) AS c
      FROM sums s JOIN counts c USING (label)
      GROUP BY s.label
    )
    SELECT v.vec_id, v.label,
           CAST(list_sum(list_transform(range(1, len(v.q) + 1),
                                        i -> v.q[i] * cent.c[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(v.q, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(cent.c, x -> x * x)) AS DOUBLE)))
             AS cos_to_centroid
    FROM v JOIN cent USING (label)
"""


@query("sim_centroid_alignment", oracle=_CENTROID_ORACLE, tags=("similarity", "centroid"))
def sim_centroid_alignment(spark, sf_dir):
    """EMBEDDING CLUSTER COHESION: every vector's cosine to its label's
    centroid — the per-example alignment score under cluster-quality
    audits and SemDedup-style pruning decisions ("how typical is this
    example of its class?"). The centroid is the elementwise
    FLOOR-AVERAGE of the quantized int vectors: exact integer floor
    division keeps centroid components in the same bounded range as
    the vectors themselves (so every dot/norm stays comfortably in
    int64 at ANY corpus size — a raw SUM centroid would overflow the
    norm at ~1000× scale) and is bit-portable. Cosines are the
    quantized-int exact form of sim_knn_cosine_brute.

    Scale shape: the centroid build is a (label, dim)-keyed partial
    agg — |labels|·|dims| rows — and broadcasts back; scoring is
    map-only. The corpus never shuffles.
    """
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", quantize(F.col("embedding")).alias("q"))
    ex = v.select("label", F.posexplode("q").alias("pos", "x"))
    sums = ex.groupBy("label", "pos").agg(F.sum("x").cast("bigint").alias("s"))
    counts = v.groupBy("label").agg(F.count("*").cast("bigint").alias("n"))
    cent = (
        sums.join(F.broadcast(counts), "label")
        .select(
            "label",
            "pos",
            F.floor(F.col("s").cast("double") / F.col("n")).cast("bigint").alias("cx"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda st: st.cx,
            ).alias("c")
        )
    )
    return v.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        cosine_q(F.col("q"), F.col("c")).alias("cos_to_centroid"),
    )


# ---------------------------------------------------------------------------
# IVFADC: IVF coarse quantizer + PQ asymmetric-distance fine scan
# ---------------------------------------------------------------------------

_IVFADC_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), cents AS (
      SELECT vec_id AS cell, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8
    ), scored AS (
      SELECT n.vec_id, cents.cell,
             CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                          i -> n.q[i] * cents.cq[i])) AS DOUBLE)
               / (n.nrm * cents.cnrm) AS csim
      FROM n, cents
    ), assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell) AS rn
        FROM scored
      ) WHERE rn = 1
    ), qv AS (
      SELECT q AS q0, nrm AS nrm0 FROM n WHERE vec_id = 0
    ), probe AS (
      SELECT cell FROM (
        SELECT cents.cell,
               CAST(list_sum(list_transform(range(1, len(cents.cq) + 1),
                                            i -> cents.cq[i] * qv.q0[i])) AS DOUBLE)
                 / (cents.cnrm * qv.nrm0) AS csim
        FROM cents, qv
      ) ORDER BY csim DESC, cell LIMIT 3
    ), cb AS (
      SELECT ms.m, v.vec_id AS code,
             v.q[ms.m * 8 + 1 : ms.m * 8 + 8] AS cvec
      FROM v, (SELECT unnest(range(0, 8)) AS m) ms
      WHERE v.vec_id < 16
    ), dists AS (
      SELECT v.vec_id, cb.m, cb.code,
             list_sum(list_transform(range(1, 9),
               i -> (v.q[cb.m * 8 + i] - cb.cvec[i])
                    * (v.q[cb.m * 8 + i] - cb.cvec[i]))) AS dist
      FROM v, cb
    ), enc AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM dists
      ) WHERE rn = 1
    ), qtab AS (
      SELECT m, code, dist FROM dists WHERE vec_id = 0
    ), adc AS (
      SELECT e.vec_id, SUM(qt.dist) AS adc_dist
      FROM enc e
      JOIN assigned a ON e.vec_id = a.vec_id
      JOIN probe p ON a.cell = p.cell
      JOIN qtab qt ON e.m = qt.m AND e.code = qt.code
      WHERE e.vec_id != 0
      GROUP BY e.vec_id
    ), top AS (
      SELECT vec_id, adc_dist FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    )
    SELECT t.vec_id AS nn_id,
           CAST(t.adc_dist AS BIGINT) AS adc_dist,
           CAST(list_sum(list_transform(range(1, len(n.q) + 1),
                                        i -> n.q[i] * qv.q0[i])) AS DOUBLE)
             / (n.nrm * qv.nrm0) AS cos_sim
    FROM top t JOIN n ON t.vec_id = n.vec_id, qv
"""


@query(
    "sim_ann_ivfadc_topk",
    oracle=_IVFADC_ORACLE,
    tags=("similarity", "ann", "ivf", "pq", "ivfadc"),
)
def sim_ann_ivfadc_topk(spark, sf_dir, n_cells: int = 8, nprobe: int = 3):
    """IVFADC (Jégou et al., TPAMI 2011) — the standard billion-scale
    ANN layout, composed from this repo's two gated stages: the IVF
    coarse quantizer (seeded cells, map-only broadcast-codebook argmax
    — sim_ann_ivf_topk's assignment) restricts the scan to the query's
    nprobe=3 nearest cells, and PQ asymmetric distance
    (sim_ann_pq_adc_topk's 8-byte codes + literal ADC lookup table)
    ranks ONLY those candidates; the top-10 by (adc, vec_id) are
    exact-rescored with quantized-int cosine.

    Why it matters at 100 TB: cell id = partition key means a probe
    touches nprobe/n_cells of the corpus, and PQ codes shrink the
    scanned bytes another 32× — multiplicative wins; every corpus pass
    here (assign, encode, ADC) is map-only, the only shuffle-ish step
    is TakeOrdered over the probed candidates.

    Oracle: the identical composition in DuckDB — seeded-cell
    assignment window, probe selection, integer sub-distances with
    (dist, code) tie-break, integer ADC sums — bit-exact end to end
    (the same CTEs as the two parent queries, joined)."""
    import numpy as np

    from minoan_athenaeum_spark.operators.similarity import pq_encoder

    e = t(spark, sf_dir, "embeddings")
    release_tracked()
    v = persist_tracked(e.select("vec_id", quantize(F.col("embedding")).alias("q")))
    # coarse stage: seeded cells, broadcast-codebook map-only argmax
    cents = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("q").alias("cq"))
    )
    codebook = cents.agg(
        F.collect_list(F.struct(F.col("cell"), F.col("cq"))).alias("cb")
    )
    best = nearest_cell(F.col("q"), F.col("cb"))
    assigned = v.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "q", best.getField("cell").alias("cell")
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("q").alias("q0"))
    probe_cells = (
        cents.crossJoin(F.broadcast(qv))
        .select("cell", cosine_q(F.col("cq"), F.col("q0")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("cell"))
        .limit(nprobe)
        .select("cell")
    )
    # fine stage: PQ codebooks + query ADC table (bounded model
    # artifacts, same seeding as sim_ann_pq_adc_topk)
    seed_rows = {
        int(r["vec_id"]): [int(x) for x in r["q"]]
        for r in v.filter(F.col("vec_id") < 16).collect()
    }
    q0_np = np.array(seed_rows[0], dtype=np.int64)
    CB = np.array(
        [[seed_rows[c][s * 8 : (s + 1) * 8] for c in range(16)] for s in range(8)],
        dtype=np.int64,
    )
    tab = [
        [int(((q0_np[s * 8 : (s + 1) * 8] - CB[s][c]) ** 2).sum()) for c in range(16)]
        for s in range(8)
    ]
    enc = pq_encoder(CB)
    cand = assigned.filter(F.col("vec_id") != 0).join(
        F.broadcast(probe_cells), "cell"
    )
    coded = cand.select("vec_id", "q", enc(F.col("q")).alias("codes"))
    adc = None
    for s in range(8):
        term = F.element_at(
            F.array(*[F.lit(x) for x in tab[s]]),
            F.col("codes").getItem(s).cast("int") + 1,
        )
        adc = term if adc is None else adc + term
    top = (
        coded.select("vec_id", "q", adc.cast("bigint").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )
    return top.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("nn_id"),
        "adc_dist",
        cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
    )


_COV_DIM = 64
_COV_ORACLE = f"""
    WITH v AS (
      SELECT {_QUANT} AS q FROM embeddings
    ), pairs AS (
      SELECT ii.i AS i, jj.j AS j,
             CAST(SUM(q[ii.i + 1] * q[jj.j + 1]) AS BIGINT) AS s
      FROM v, range({_COV_DIM}) ii(i), range({_COV_DIM}) jj(j)
      WHERE ii.i <= jj.j
      GROUP BY 1, 2
    ), firsts AS (
      SELECT ii.i AS i, -1 AS j, CAST(SUM(q[ii.i + 1]) AS BIGINT) AS s
      FROM v, range({_COV_DIM}) ii(i)
      GROUP BY 1
    ), cnt AS (
      SELECT -1 AS i, -1 AS j, CAST(COUNT(*) AS BIGINT) AS s FROM v
    )
    SELECT i, j, s FROM pairs
    UNION ALL SELECT i, j, s FROM firsts
    UNION ALL SELECT i, j, s FROM cnt
"""


@query(
    "sim_pca_covariance",
    oracle=_COV_ORACLE,
    tags=("similarity", "pca", "moments"),
)
def sim_pca_covariance(spark, sf_dir):
    """Exact integer covariance power sums of the embedding corpus in
    ONE Arrow pass (operators/pca.py::covariance_power_sums): each
    partition accumulates the int64 Gram matrix XᵀX + column sums +
    count with numpy matmuls and emits ~dim²/2 cells once — the corpus
    is never exploded by dim² the way the oracle twin does (4096× row
    blowup, fine at sf0.01, fatal at 100 TB). Feeds driver-side PCA /
    whitening (pca_components — eigh of a 64×64 bounded model
    artifact, pytest-verified)."""
    from minoan_athenaeum_spark.operators.pca import covariance_power_sums

    e = t(spark, sf_dir, "embeddings")
    v = e.select(quantize(F.col("embedding")).alias("q"))
    return covariance_power_sums(v, "q", _COV_DIM)


_JL_K = 32
_JL_R = 100
_JL_SIGN_SQL = (
    "CASE WHEN (CAST(('0x' || substr(md5('jl_' || CAST(mm AS VARCHAR) || '_' "
    "|| CAST(jj - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1 "
    "THEN q[jj] ELSE -q[jj] END"
)
_JL_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), proj AS (
      SELECT vec_id, q,
             list_transform(range(0, {_JL_K}), mm ->
               CAST(list_sum(list_transform(range(1, len(q) + 1), jj ->
                  {_JL_SIGN_SQL})) AS BIGINT)) AS r
      FROM v
    ), n AS (
      SELECT vec_id, q, r,
             sqrt(CAST(list_sum(list_transform(r, x -> x * x)) AS DOUBLE)) AS rnrm,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS qnrm
      FROM proj
    ), qv AS (
      SELECT q AS q0, r AS r0, rnrm AS rnrm0, qnrm AS qnrm0 FROM n WHERE vec_id = 0
    ), cand AS (
      SELECT n.vec_id, n.q, n.qnrm, qv.q0, qv.qnrm0,
             CAST(list_sum(list_transform(range(1, {_JL_K} + 1),
                                          i -> n.r[i] * qv.r0[i])) AS DOUBLE)
               / (n.rnrm * qv.rnrm0) AS jl_cos
      FROM n, qv
      WHERE n.vec_id != 0
      ORDER BY jl_cos DESC, n.vec_id
      LIMIT {_JL_R}
    )
    SELECT vec_id AS nn_id, jl_cos,
           CAST(list_sum(list_transform(range(1, len(q) + 1),
                                        i -> q[i] * q0[i])) AS DOUBLE)
             / (qnrm * qnrm0) AS cos_sim
    FROM cand
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
"""


@query(
    "sim_jl_project_topk",
    oracle=_JL_ORACLE,
    tags=("similarity", "jl", "dimreduction"),
)
def sim_jl_project_topk(spark, sf_dir):
    """Johnson-Lindenstrauss ANN serving: project 64-dim quantized
    vectors to 32 dims with a deterministic ±1 sign matrix (parity of
    the portable md5-60-bit hash of ("jl", m, j) — the engine-portable
    convention sign-LSH uses), sweep the corpus in REDUCED space (2×
    less dot-product work and 2× smaller vectors to scan/store — the
    point of JL at 100 TB), TakeOrdered the top-100 candidates by
    projected cosine, then exact-rescore just those and emit the
    top-10 by true cosine. Projection is map-only JVM fold
    expressions; the corpus never shuffles. Candidate recall vs brute
    is pinned in tests/test_dedup_similarity.py; the oracle replays
    the identical projection in DuckDB bit-exactly."""
    import hashlib

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))

    # The ±1 matrix is data-independent, so it is materialized ONCE on
    # the driver (hashlib md5 == SQL md5, same parity convention as the
    # oracle) and folded in as literal arrays — the oracle recomputes
    # the hash per cell, which is fine at oracle scale but would cost
    # 2048 md5 calls PER ROW here (measured: a 2M-vector corpus DNF'd).
    def sign(m: int, j: int) -> int:
        h = int(hashlib.md5(f"jl_{m}_{j}".encode()).hexdigest()[:15], 16)
        return 1 if h & 1 else -1

    def component(m: int):
        signs = F.array(*[F.lit(sign(m, j)) for j in range(_COV_DIM)])
        return F.aggregate(
            F.zip_with(F.col("q"), signs, lambda x, sg: x * sg.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    proj = v.select(
        "vec_id", "q", F.array(*[component(m) for m in range(_JL_K)]).alias("r")
    )
    qv = proj.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    cand = (
        proj.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "q",
            "q0",
            cosine_q(F.col("r"), F.col("r0")).alias("jl_cos"),
        )
        .orderBy(F.col("jl_cos").desc(), F.col("vec_id"))
        .limit(_JL_R)
    )
    return (
        cand.select(
            F.col("vec_id").alias("nn_id"),
            "jl_cos",
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("nn_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Prefix-dimension screen + exact rerank (Matryoshka-style two-stage ANN)
# ---------------------------------------------------------------------------

_PFX_DIMS = 16   # screening prefix length (of 64 dims)
_PFX_CAND = 100  # candidates surviving the screen

_PFX_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), p AS (
      SELECT vec_id, q, q[1:{_PFX_DIMS}] AS pq,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qv AS (
      SELECT q AS q0, pq AS pq0, nrm AS nrm0 FROM p WHERE vec_id = 0
    ), scored AS (
      SELECT p.vec_id, p.q, p.nrm, qv.q0, qv.nrm0,
             CAST(list_sum(list_transform(range(1, {_PFX_DIMS} + 1),
                                          i -> p.pq[i] * qv.pq0[i])) AS BIGINT)
               AS prefix_dot
      FROM p, qv WHERE p.vec_id != 0
    ), cand AS (
      SELECT * FROM scored ORDER BY prefix_dot DESC, vec_id LIMIT {_PFX_CAND}
    )
    SELECT vec_id AS nn_id, prefix_dot,
           CAST(list_sum(list_transform(range(1, len(q) + 1),
                                        i -> q[i] * q0[i])) AS DOUBLE)
             / (nrm * nrm0) AS cos_sim
    FROM cand
    ORDER BY cos_sim DESC, nn_id
    LIMIT 10
"""


@query(
    "sim_ann_prefix_rerank",
    oracle=_PFX_ORACLE,
    tags=("similarity", "ann", "prefix", "rerank"),
)
def sim_ann_prefix_rerank(spark, sf_dir):
    """Two-stage ANN via PREFIX-dimension screening: rank the whole
    corpus by the exact integer dot product of only the FIRST
    ``_PFX_DIMS`` (16 of 64) quantized dimensions, keep the top
    ``_PFX_CAND`` (100) candidates, then rerank those exactly with the
    full-dimension cosine. This is the retrieval pattern
    Matryoshka-style embeddings are trained for (Kusupati et al. 2022,
    public): leading dimensions carry the coarse signal, so a
    prefix-only scan buys a large bandwidth/compute cut and a small
    exact rerank restores precision. Both stages are deterministic
    integer/IEEE arithmetic with total-order tie-breaks, so the DuckDB
    twin is bit-exact — the gate covers the screen AND the rerank
    (prefix_dot is projected out precisely so the oracle pins the
    candidate stage, not just the final list).

    Scale shape: the screen is an embarrassingly-parallel map over the
    corpus + TakeOrderedAndProject (per-partition top-C, merge of
    C-sized lists — no corpus shuffle, no window); the rerank touches C
    rows. On a real deployment the prefix lives as its own (4x
    narrower) column/file so the screen's scan I/O drops
    proportionally — here the slice happens in-plan, which still cuts
    the dot-product work 4x while the exact baseline
    (sim_knn_cosine_brute) pays full width on every row. The JL
    variant (sim_jl_project_topk) solves the same problem for
    embeddings WITHOUT prefix-ordered training; this one is the
    cheaper screen when the embedding family guarantees it."""
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    p = v.select(
        "vec_id",
        "q",
        F.slice(F.col("q"), 1, _PFX_DIMS).alias("pq"),
    )
    qv = p.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("q0"), F.col("pq").alias("pq0")
    )
    from minoan_athenaeum_spark.operators.similarity import dot_int

    cand = (
        p.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "q",
            "q0",
            dot_int(F.col("pq"), F.col("pq0")).alias("prefix_dot"),
        )
        .orderBy(F.col("prefix_dot").desc(), F.col("vec_id"))
        .limit(_PFX_CAND)
    )
    return (
        cand.select(
            F.col("vec_id").alias("nn_id"),
            "prefix_dot",
            cosine_q(F.col("q"), F.col("q0")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("nn_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# r9: ANN quality evaluation harness — recall@k of the prefix-screen
# ANN against the exact ground truth, per query vector. The missing
# piece between "we have five ANN variants" and "we can certify one
# for a corpus": production retrieval teams run exactly this join
# after any index/screen parameter change.

_RECALL_Q = 8    # query vectors (vec_id < _RECALL_Q)
_RECALL_K = 10   # recall@k

_RECALL_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), p AS (
      SELECT vec_id, q, q[1:{{pfx}}] AS pq,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM v
    ), qs AS (
      SELECT vec_id AS qid, q AS q0, pq AS pq0, nrm AS nrm0
      FROM p WHERE vec_id < {{nq}}
    ), scored AS (
      SELECT s.qid, p.vec_id,
             CAST(list_sum(list_transform(range(1, {{pfx}} + 1),
                                          i -> p.pq[i] * s.pq0[i])) AS BIGINT) AS prefix_dot,
             CAST(list_sum(list_transform(range(1, len(p.q) + 1),
                                          i -> p.q[i] * s.q0[i])) AS DOUBLE)
               / (p.nrm * s.nrm0) AS cos
      FROM p, qs s WHERE p.vec_id != s.qid
    ), exact AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
        FROM scored) WHERE rn <= {{k}}
    ), cand AS (
      SELECT qid, vec_id, cos FROM (
        SELECT qid, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY prefix_dot DESC, vec_id) AS rn
        FROM scored) WHERE rn <= {{cand}}
    ), approx AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
        FROM cand) WHERE rn <= {{k}}
    )
    SELECT e.qid AS query_id,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / {{k}}.0 AS recall_at_k
    FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id
    GROUP BY e.qid
    """.format(nq=_RECALL_Q, k=_RECALL_K, cand=_PFX_CAND, pfx=_PFX_DIMS)


@query(
    "sim_ann_recall_eval",
    oracle=_RECALL_ORACLE,
    tags=("similarity", "ann", "evaluation", "recall"),
)
def sim_ann_recall_eval(spark, sf_dir):
    """Recall@10 of the prefix-screen ANN (sim_ann_prefix_rerank's
    16-of-64-dim screen, top-100 candidates, exact rerank) against the
    exact cosine top-10, per query vector — the evaluation join a
    retrieval team runs to certify an ANN configuration on THEIR
    corpus before serving it. One row per query: (query_id, n_hits,
    recall_at_k). Both rankings use total-order tie-breaks and
    quantized-int math, so the whole evaluation is bit-exact vs the
    DuckDB twin — including the recall fractions (n/10 is exact in
    IEEE).

    Scale shape: the scored pairs are ONE map pass over the corpus
    with the Q=8 query block broadcast (evaluation needs exact ground
    truth, so the full-width cosine per (query, vector) pair is
    inherent to the task, not overhead); both top-k extractions go
    through grouped_topk_two_phase (per-partition local top-k, global
    pass over <= k*P survivors — no corpus-sized window partition even
    when Q is small and groups are huge); the hit join touches Q*k
    rows. At 100 TB with Q queries this is Q broadcast-multiplied map
    passes fused into one scan — the same cost as the exact baseline
    it certifies, which is the floor for any evaluation that reports
    TRUE recall."""
    from minoan_athenaeum_spark.operators.scan import grouped_topk_two_phase
    from minoan_athenaeum_spark.operators.similarity import dot_int

    k, nq = _RECALL_K, _RECALL_Q
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("q")
    )
    p = v.select("vec_id", "q", F.slice(F.col("q"), 1, _PFX_DIMS).alias("pq"))
    qs = p.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"),
        F.col("q").alias("q0"),
        F.col("pq").alias("pq0"),
    )
    release_tracked()
    scored = persist_tracked(
        p.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            dot_int(F.col("pq"), F.col("pq0")).alias("prefix_dot"),
            cosine_q(F.col("q"), F.col("q0")).alias("cos"),
        )
    )
    exact = grouped_topk_two_phase(
        scored, ["qid"], [F.col("cos").desc(), "vec_id"], k
    ).select("qid", "vec_id")
    cand = grouped_topk_two_phase(
        scored, ["qid"], [F.col("prefix_dot").desc(), "vec_id"], _PFX_CAND
    ).select("qid", "vec_id", "cos")
    approx = grouped_topk_two_phase(
        cand, ["qid"], [F.col("cos").desc(), "vec_id"], k
    ).select("qid", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.join(approx, ["qid", "vec_id"], "left")
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.sum("hit"), F.lit(0)).cast("double") / F.lit(float(k))
            ).alias("recall_at_k"),
        )
    )
