"""CDC / changelog materialization — turning an insert/update/delete
event log into the current snapshot (the Debezium→warehouse pattern; a
training-data pipeline meets it as "apply the crawl's revisit log").

The changelog here is synthesized DETERMINISTICALLY from orders so the
DuckDB oracle can rebuild the identical log: every order inserts at
seq 1; orderkey%3==0 updates at seq 2 (+10.00); orderkey%7==0 updates
again at seq 3 (+25.00); orderkey%5==0 deletes at seq 4; orderkey%10==0
re-inserts at seq 5 (+0.99, status 'R') — covering update-after-insert,
multi-update, delete, and insert-after-delete, all exact-integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.merge import apply_changelog
from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"

_CDC_ORACLE = f"""
    WITH changelog AS (
        SELECT o_orderkey, 1 AS seq, 'I' AS op,
               {_CENTS} AS price_cents, o_orderstatus AS status
        FROM orders
        UNION ALL
        SELECT o_orderkey, 2, 'U', {_CENTS} + 1000, o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, 3, 'U', {_CENTS} + 2500, o_orderstatus
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, 4, 'D', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, 5, 'I', {_CENTS} + 99, 'R'
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    compacted AS (
        SELECT o_orderkey,
               arg_max(price_cents, seq) AS price_cents,
               arg_max(status, seq) AS status,
               arg_max(op, seq) AS final_op,
               COUNT(*) AS versions
        FROM changelog
        GROUP BY o_orderkey
    )
    SELECT o_orderkey, price_cents, status, versions
    FROM compacted
    WHERE final_op <> 'D'
"""


def _synth_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(_CENTS).alias("cents"),
        "o_orderstatus",
    )
    k = F.col("o_orderkey")

    def version(pred, seq: int, op: str, cents, status):
        df = o.where(pred) if pred is not None else o
        return df.select(
            "o_orderkey",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            cents.cast("long").alias("price_cents"),
            status.alias("status"),
        )

    return (
        version(None, 1, "I", F.col("cents"), F.col("o_orderstatus"))
        .unionAll(version(k % 3 == 0, 2, "U", F.col("cents") + 1000, F.col("o_orderstatus")))
        .unionAll(version(k % 7 == 0, 3, "U", F.col("cents") + 2500, F.col("o_orderstatus")))
        .unionAll(
            version(
                k % 5 == 0, 4, "D", F.lit(None), F.lit(None).cast("string")
            )
        )
        .unionAll(version(k % 10 == 0, 5, "I", F.col("cents") + 99, F.lit("R")))
    )


@query("cdc_apply_changelog", oracle=_CDC_ORACLE, tags=("cdc", "merge"))
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact a 5-way I/U/D changelog over orders to the live
    snapshot with last-writer-wins + delete semantics
    (`operators/merge.py::apply_changelog`).

    Scale shape: ONE hash-aggregate shuffle on the key with map-side
    partial max_by — the full version history never sorts and never
    moves more than one pre-reduced row per key per input partition.
    Contrast a row_number() window, which would shuffle AND sort every
    version (see operator docstring).
    """
    log = _synth_changelog(spark, sf_dir)
    return apply_changelog(
        log, key="o_orderkey", seq="seq", op="op",
        payload_cols=["price_cents", "status"],
    )
