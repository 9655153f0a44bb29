"""Slowly-Changing-Dimension Type 2 maintenance — versioned upsert.

The warehouse pattern for dimensions whose attribute history matters:
instead of overwriting, a changed row's current version is CLOSED
(``valid_to`` set to the effective timestamp) and a new open version is
inserted. Unchanged rows and no-op updates (same attributes) pass
through untouched; brand-new keys insert an open version.

Scale shape: one equi-join of the CURRENT slice against the updates
feed on the business key (updates are the small side of a dimension
feed — AQE broadcasts them), then unions. History rows are never
touched, so the cost is proportional to |current| + |updates|, not to
the full version history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    validate_keys: bool = True,
) -> DataFrame:
    """Apply one batch of ``updates`` (columns: ``key`` + ``attrs``) to
    an SCD2 ``dim`` (columns: ``key`` + ``attrs`` + validity interval,
    open rows have NULL ``to_col``) at effective time ``effective`` (a
    literal string/timestamp value). Returns the new full dimension.

    PRECONDITION (same as merge_upsert): at most one update row per
    key — SQL MERGE semantics; enforced eagerly unless
    ``validate_keys=False``."""
    if validate_keys:
        dup = updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
        if dup:
            raise ValueError(
                f"scd2_apply: updates feed has multiple rows for at least one "
                f"value of key {key!r}; dedupe upstream"
            )
    hist = dim.filter(F.col(to_col).isNotNull())
    cur = dim.filter(F.col(to_col).isNull())
    u = updates.select(
        F.col(key), *[F.col(a).alias(f"__u_{a}") for a in attrs]
    )
    differs = F.lit(False)
    for a in attrs:
        differs = differs | (~F.col(a).eqNullSafe(F.col(f"__u_{a}")))
    # Presence test via a marker column (an update's attrs may
    # legitimately be NULL, so attr-nullness cannot signal presence).
    marker = "__u_present"
    u_marked = u.withColumn(marker, F.lit(True))
    j = cur.join(u_marked, key, "left")
    changed_pred = F.col(marker).isNotNull() & differs
    unchanged = j.filter(~F.coalesce(changed_pred, F.lit(False))).select(
        key, *attrs, from_col, to_col
    )
    closed = j.filter(changed_pred).select(
        key,
        *attrs,
        F.col(from_col),
        F.lit(effective).alias(to_col),
    )
    reopened = j.filter(changed_pred).select(
        key,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.lit(effective).alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    inserted = (
        u_marked.join(cur.select(key), key, "left_anti")
        .select(
            key,
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.lit(effective).alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(
        reopened
    ).unionByName(inserted)
