"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from minoan_athenaeum_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: Column, prec: int = 12, scale: int = 4) -> Column:
    """Exact-decimal cast used so aggregate arithmetic matches the DuckDB
    oracle bit-for-bit (both engines do exact decimal math, then an
    identical value→double cast)."""
    return col.cast(f"decimal({prec},{scale})")


# Shared exact revenue term: extendedprice * (1 - discount) in decimal
# (scale kept ≤6 end-to-end so decimal→double casts single-round — see
# registry docstring).
REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))"


def rev():
    from pyspark.sql import functions as F

    return dec(F.col("l_extendedprice"), 12, 2) * (1 - dec(F.col("l_discount"), 6, 2))


# --------------------------------------------------- lazy construction
# A DataFrame whose plan is built on FIRST use instead of at
# construction. Needed for query builders whose plan embeds a
# data-dependent model artifact (e.g. pipeline_dsir_select's ≤B-row
# bucket fit): the fit requires running a Spark job, but callers that
# merely construct-and-hold the DataFrame (registry sweeps, laziness
# pins) must not pay it. Subclassing the classic DataFrame keeps
# isinstance checks and every method working — methods only read
# ``self._jdf`` (here a property that forces the thunk once) and
# ``self._session``/``self._sc``, which we set eagerly.


def lazy_dataframe(spark: SparkSession, thunk) -> DataFrame:
    """Return a real DataFrame that materializes ``thunk()`` (a
    zero-arg callable returning a DataFrame) on first use and caches
    it. Construction runs no Spark job.

    Internals pin: this mirrors the classic DataFrame's ``__init__``
    attribute contract (``_session``/``_sc``/``is_cached``/
    ``_support_repr_html``) and shadows the normally-writable ``_jdf``
    instance attribute with a read-only property — valid because
    nothing in pyspark 4.1.x assigns ``_jdf`` outside ``__init__``. A
    PySpark upgrade is the one thing that can break this, and it
    breaks loudly (AttributeError on the first method call), which the
    dsir laziness + oracle tests exercise on every run."""
    import threading

    import pyspark
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    # ADVICE r10 (_util.py): fail the internals pin with a clear,
    # actionable message instead of an AttributeError deep inside a
    # query. The 4.1.x contract this relies on: classic
    # DataFrame.__init__ assigns only _session/_sc/_jdf/is_cached/
    # _support_repr_html, nothing else assigns _jdf, and methods read
    # it via the instance attribute (so a class-level property shadow
    # wins). Re-validate those three facts before widening this gate.
    if not pyspark.__version__.startswith("4.1."):
        raise RuntimeError(
            "lazy_dataframe pins pyspark 4.1.x DataFrame internals "
            "(read-only _jdf property shadow on a classic-DataFrame "
            f"subclass) but pyspark {pyspark.__version__} is installed. "
            "Re-validate the __init__ attribute contract documented in "
            "minoan_athenaeum_spark/queries/_util.py and widen the "
            "version gate."
        )

    class _LazyDataFrame(_ClassicDF):
        def __init__(self, session, fn):
            self._session = session
            self._sc = session._sc
            self.is_cached = False
            self._support_repr_html = False
            self._lazy_thunk = fn
            self._lazy_df = None
            self._lazy_lock = threading.Lock()

        def _force(self):
            # Double-checked under a lock: concurrent first actions
            # (a sweep harness driving queries from a thread pool) must
            # neither crash on a cleared thunk nor run the expensive
            # build twice.
            if self._lazy_df is None:
                with self._lazy_lock:
                    if self._lazy_df is None:
                        self._lazy_df = self._lazy_thunk()
                        self._lazy_thunk = None
            return self._lazy_df

        @property
        def _jdf(self):
            return self._force()._jdf

    return _LazyDataFrame(spark, thunk)


# ------------------------------------------------------- persist scope
# Queries persist intermediates referenced by multiple join branches.
# The DataFrame is returned to the caller (which collects it), so the
# query function can't unpersist before consumption — instead each
# persisting query releases the PREVIOUS query's persists on entry.
# Unpersisting is always safe (the plan recomputes), so this never
# affects correctness; it stops cache blocks leaking across a long
# session running many queries.
_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped


# ------------------------------------------------- guarded broadcasts
def broadcast_if_under(
    df: DataFrame,
    n_rows: int,
    max_rows: int,
    n_bytes: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Size-guarded broadcast hint (VERDICT r10 'What's wrong' #3).

    A forced ``F.broadcast`` on a batch-sized side is correct for
    micro-batch ingest but an OOM hazard when the same query is driven
    with a TB-scale backfill batch: the driver must collect the whole
    side. Callers that KNOW the row count (e.g. from a persisted
    batch's ``count()``) pass it here; under the ceiling the broadcast
    hint is applied, over it the DataFrame is returned unhinted so
    Catalyst plans a shuffle join — degraded throughput, never an OOM.

    Row count (not bytes) is the knob because the guarded sides are
    bounded-width rows (band keys, shingle arrays of capped documents);
    the ceiling should be set so rows x width stays well inside
    ``spark.sql.autoBroadcastJoinThreshold``-scale memory. For
    payload-heavy sides where width is NOT bounded, pass ``max_bytes``
    and the side's measured size (:func:`cached_size_bytes`) — the r11
    cluster-corpus probe found a 128k-row batch of wide shingle arrays
    sailing under the 4M-row ceiling while weighing GIGABYTES, and the
    forced broadcast-relation build dominated the serve.
    """
    from pyspark.sql import functions as F

    if n_rows > max_rows:
        return df
    if max_bytes is not None and n_bytes is not None and n_bytes > max_bytes:
        return df
    return F.broadcast(df)


def cached_size_bytes(df: DataFrame) -> int | None:
    """Exact in-memory size of a PERSISTED-and-materialized DataFrame,
    from the optimized plan's statistics (the InMemoryRelation reports
    its true cached size once an action has run). None when the stats
    are unavailable or clearly not cache-backed (Spark's default
    sizeInBytes for unknown plans is a huge sentinel)."""
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
    # defaultSizeInBytes sentinel (Long.MaxValue-ish) => not measured
    if size <= 0 or size >= (1 << 62):
        return None
    return size
