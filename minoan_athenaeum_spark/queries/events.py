"""Event/time-series queries over the events table.

These are the batch-semantics twins of the Structured Streaming
operators in ``minoan_athenaeum_spark/streaming/`` (same windowing
logic; streaming adds watermarks/state). Window starts are emitted as
epoch seconds (BIGINT) so Spark and DuckDB compare exactly regardless of
timestamp-type plumbing (events.parquet is TIMESTAMP(NANOS), which
Spark cannot read natively — see catalog.load_events).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import dec, t
from minoan_athenaeum_spark.registry import query


@query(
    "evt_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS wstart,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window", "streaming-twin"),
)
def evt_tumbling_window(spark, sf_dir):
    """1-hour tumbling-window counts/sums per event type — batch twin of
    the streaming tumbling aggregation. Spark `window()` starts align to
    the epoch, i.e. floor(epoch/3600)*3600."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec(F.col("value"), 12, 2)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("wstart"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@query(
    "evt_sliding_window",
    oracle="""
    SELECT wstart, event_type, COUNT(*) AS cnt
    FROM (
      SELECT CAST(floor(epoch(ts) / 900) * 900 - 900 * j AS BIGINT) AS wstart,
             event_type
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
    )
    GROUP BY wstart, event_type
    """,
    tags=("events", "window", "streaming-twin"),
)
def evt_sliding_window(spark, sf_dir):
    """1-hour window sliding every 15 min: each event lands in 4 windows
    (Spark expands exactly this way internally)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("wstart"),
            "event_type",
            "cnt",
        )
    )


@query(
    "evt_sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts)
                    - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000
                  OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), y AS (
      SELECT user_id, event_id, us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM x
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us
    FROM y GROUP BY user_id, sess_id
    """,
    tags=("events", "session", "streaming-twin"),
)
def evt_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity gap) via lag +
    running sum — batch twin of streaming session windows. Integer-µs
    arithmetic keeps both engines exact."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    x = e.withColumn(
        "new_sess",
        F.when(
            (F.col("us") - F.lag("us").over(w) > 1800000000)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    y = x.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return y.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@query(
    "evt_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
    tags=("events", "json"),
)
def evt_json_extract(spark, sf_dir):
    """JSON field extraction from the props column (semi-structured
    path), aggregated per event type."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count("*").alias("cnt"),
    )


@query(
    "evt_pivot_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup_cnt,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt
    FROM events GROUP BY user_id
    """,
    tags=("events", "pivot"),
)
def evt_pivot_counts(spark, sf_dir):
    """Pivot event_type → per-user count columns (conditional aggregation
    — identical plan shape to groupBy().pivot() but with stable column
    names for the oracle)."""
    e = t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == et, 1).otherwise(0))
        .cast("bigint")
        .alias(f"{et}_cnt")
        for et in ("click", "view", "purchase", "signup", "error")
    ]
    return e.groupBy("user_id").agg(*aggs)


@query(
    "evt_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
    tags=("events", "variant", "json"),
)
def evt_variant_extract(spark, sf_dir):
    """Semi-structured extraction through the VARIANT type (Spark 4):
    props parses once into the binary variant encoding
    (``parse_json``), then fields are read with typed
    ``variant_get`` — the engine path that replaces repeated
    string-level ``get_json_object`` parsing. At scale the difference
    is structural: VARIANT parses each JSON document ONCE into a
    shredded binary form that all downstream extractions share, while
    the string path re-parses per extraction expression. The oracle
    computes the same aggregates with DuckDB's JSON functions."""
    e = t(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.count("*").alias("cnt"),
    )
