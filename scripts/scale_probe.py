"""Scale probe: amplify the sf0.1 testdata ~16× (≈10M lineitem rows,
~25M total rows incl. orders) into /tmp, then run the scan/join/agg
headline queries against it and print per-query seconds.

Purpose: evidence that query time scales ~linearly with data volume
once fixed overhead is amortized — i.e. the plans are
shuffle/broadcast-shaped correctly for data far beyond the graded sf.
Key-space is shifted per replica so join fan-outs and group counts grow
realistically (orderkeys/custkeys stay consistent across tables).

Usage:  python scripts/scale_probe.py [amplification]
Writes one JSON line like bench.py.

NOTE (r14): the session's default driver heap is now 8g (sized for the
sf-scale local data — see session.py). Amplified probe runs need the
old headroom back: export SPARK_GRAFT_DRIVER_MEM=48g for amplification
>= 16.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark

AMPLIFIED = ["agg_tpch_q1", "agg_tpch_q6", "agg_tpch_q3_top10",
             "agg_tpch_q5_region_revenue", "tpch_q18_large_orders",
             "tpch_q12_shipmode", "dedup_exact", "win_row_number_topk_per_group",
             # Training-pipeline family over the amplified documents
             # table. Near-dup PAIR queries are deliberately absent:
             # replica amplification makes every document an exact
             # duplicate of its ~256 copies, so pair enumeration is
             # quadratic in the replica count by construction — a
             # property of the synthetic amplification, not the plan.
             "pipeline_clean_corpus", "pipeline_decontaminate",
             "pipeline_pack_sequences", "text_tfidf_top_terms",
             # Similarity family over amplified embeddings (vec_id
             # shifted per replica; the first replica keeps vec_id 0-7,
             # so the kNN query vector and the SemDedup codebook exist
             # unchanged).
             "sim_knn_cosine_brute", "sim_semdedup",
             # Events family over amplified events (25.6M rows at 256x;
             # event_id/user_id shifted per replica, timestamps shared —
             # denser traffic, more users, same horizon).
             "ts_asof_join", "evt_sessionize", "stream_tumbling_exec",
             # Theta join over full 153.6M x 9.6M via distinct-key
             # summarization; exact power-sum stats over lineitem.
             "theta_count_by_key", "stat_variance_stddev",
             # r3 additions: full curation capstone, RANGE-frame window,
             # exactly-once sink drain, Arrow-assigned kmeans IVF, and
             # the real multimodal decoders (all map-only Arrow stages).
             "pipeline_full_curation", "win_time_range_moving_sum",
             "stream_idempotent_sink_exec", "sim_ann_ivf_kmeans_topk",
             "mm_ppm_decode_stats", "mm_wav_audio_features",
             "mm_video_frame_sample"]

# Key columns to shift per replica so each copy is a distinct key range.
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
KEY_STRIDE = 10_000_000


def amplify(spark, src_sf: str, out_dir: str, times: int) -> None:
    # At very large amplifications disk is the constraint; an explicit
    # table subset (comma-separated SPARK_GRAFT_AMPLIFY_TABLES) lets a
    # probe amplify only the tables its query subset touches.
    tables = ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "documents", "embeddings", "events")
    only = os.environ.get("SPARK_GRAFT_AMPLIFY_TABLES", "")
    if only:
        tables = tuple(t for t in tables if t in only.split(","))
    for name in tables:
        if os.path.exists(f"{out_dir}/{name}.parquet") and not os.path.islink(
            f"{out_dir}/{name}.parquet"
        ):
            continue  # idempotent per table (lets new tables amplify in place)
        if os.path.islink(f"{out_dir}/{name}.parquet"):
            os.unlink(f"{out_dir}/{name}.parquet")
        # events goes through load_table too: the catalog normalizes the
        # source's ts unit (footer-detected ns or µs) to a native µs
        # TIMESTAMP, and Spark writes that back as TIMESTAMP(MICROS) —
        # which the loader and the stream reader then read natively.
        df = load_table(spark, src_sf, name)
        if name in SHIFT_KEYS:
            # Replicate via a broadcast crossJoin with the replica-id
            # range and shift keys by replica — one compact plan at any
            # amplification (a 1024-way union plan chokes the
            # optimizer). Same row set as unioning shifted copies.
            reps = F.broadcast(
                spark.range(times).select(F.col("id").alias("__rep"))
            )
            # splittable output: scale file count with volume
            n_files = min(512, max(32, times // 2))
            if times >= 1024:
                # at huge amplifications the post-expansion repartition
                # is a full shuffle of the expanded volume (45+ GB at
                # 4096×, doubling the disk footprint via spill);
                # pre-partition the SOURCE instead so each of n_files
                # tasks expands and writes its own slice — same rows,
                # same file count, zero expanded-data shuffle
                out = df.repartition(n_files).crossJoin(reps)
            else:
                # spread the expansion across all cores — the
                # single-file testdata source reads as a couple of
                # partitions, and a 1024x expansion through 3 tasks
                # serializes the write
                out = df.repartition(32).crossJoin(reps)
            for k in SHIFT_KEYS[name]:
                out = out.withColumn(
                    k, F.col(k) + F.col("__rep") * F.lit(KEY_STRIDE)
                )
            out = out.drop("__rep")
            if times < 1024:
                out = out.repartition(n_files)
        else:
            out = df  # dims stay fixed (realistic: dims grow slower)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def start_disk_guard(min_gb: float = 3.0) -> None:
    """VERDICT r7 #8: big-shuffle probes used to die mid-stage with an
    opaque executor IOException when Spark scratch exhausted the
    shared /tmp device (the recorded 4096× DNFs). This guard turns
    that into a CLEAN abort with a recorded boundary: a daemon thread
    polls free space every 5 s and, under ``min_gb``, prints one JSON
    boundary line and SIGTERMs the whole process group (python + the
    local JVM) before the device hits zero — so the DNF row in
    BASELINE.md carries the measured free-space floor instead of a
    stack trace, and the box is left healthy (no full device)."""
    import shutil as _sh
    import signal
    import threading

    def watch() -> None:
        while True:
            free_gb = _sh.disk_usage("/tmp").free / 1e9
            if free_gb < min_gb:
                print(json.dumps({
                    "metric": "scale_probe_aborted_disk",
                    "free_gb": round(free_gb, 2),
                    "limit_gb": min_gb,
                }), flush=True)
                os.killpg(os.getpgid(0), signal.SIGTERM)
            time.sleep(5)

    threading.Thread(target=watch, daemon=True).start()


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    start_disk_guard(float(os.environ.get("SPARK_GRAFT_PROBE_MIN_FREE_GB", "3")))
    # Optional second arg: comma-separated query subset (the full
    # AMPLIFIED list at very large amplifications would take hours), or
    # "--amplify-only" to materialize the (possibly
    # SPARK_GRAFT_AMPLIFY_TABLES-subset) data and exit — running the
    # query set against a table subset would only die on missing paths.
    subset = sys.argv[2].split(",") if len(sys.argv) > 2 else AMPLIFIED
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/mas_scale_probe_x{times}"
    spark = get_spark(app_name="mas-scale-probe")
    t0 = time.perf_counter()
    amplify(spark, src, out_dir, times)  # idempotent per table
    print(f"# amplify x{times} ensured in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if "--amplify-only" in sys.argv:
        return

    if os.environ.get("SPARK_GRAFT_BUCKETED_FACTS", "") not in ("", "0"):
        from minoan_athenaeum_spark.sources.bucketed import ensure_bucketed_facts

        t0 = time.perf_counter()
        ensure_bucketed_facts(spark, out_dir)
        print(f"# bucketize ensured in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    specs = load_all()
    # warm the listing against a table that exists (a
    # SPARK_GRAFT_AMPLIFY_TABLES-subset run may not have lineitem)
    warm_tbl = next(
        (
            t
            for t in ("lineitem", "documents", "embeddings", "events")
            if os.path.exists(f"{out_dir}/{t}.parquet")
        ),
        None,
    )
    if warm_tbl is None:
        # amplify-subset runs may carry none of the four preferred
        # tables — warm against any parquet present instead of dying
        # on a bare StopIteration (ADVICE r9)
        any_pq = sorted(glob.glob(f"{out_dir}/*.parquet"))
        if not any_pq:
            sys.exit(
                f"scale_probe: no parquet tables in {out_dir} "
                f"(contents: {sorted(os.listdir(out_dir))[:20]})"
            )
        warm_tbl = os.path.splitext(os.path.basename(any_pq[0]))[0]
    spark.read.parquet(f"{out_dir}/{warm_tbl}.parquet").count()
    timings = {}
    # Default measurement is .count() (comparable with all prior rounds).
    # SPARK_GRAFT_PROBE_CHECKSUM=1 instead aggregates a bit_xor checksum
    # over EVERY column — use it for transform-shaped queries whose
    # expensive work Catalyst can prune through a cardinality-preserving
    # join when only the count is consumed (found via
    # pipeline_remove_dup_spans: 1.8 s counted vs 56.5 s checksummed).
    checksum = os.environ.get("SPARK_GRAFT_PROBE_CHECKSUM", "") not in ("", "0")
    for name in subset:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, out_dir)
        if checksum:
            cols = ", ".join(f"`{c}`" for c in df.columns)
            df.selectExpr(f"xxhash64({cols}) AS h").agg(
                F.expr("bit_xor(h)"), F.count("*")
            ).collect()
        else:
            df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
    n_warm = spark.read.parquet(f"{out_dir}/{warm_tbl}.parquet").count()
    spark.stop()
    print(json.dumps({
        "metric": "scale_probe_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        f"{warm_tbl}_rows": n_warm,
        "amplification": times,
    }))


if __name__ == "__main__":
    main()
