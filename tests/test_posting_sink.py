"""Pins for sources/posting_sink.py — the segment LAYOUT claims
(disjoint term ranges across files, sorted runs within, stats-driven
pruning) and content preservation."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.sources.posting_sink import (
    lookup_term,
    write_posting_segments,
)


def _postings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")


def test_segment_layout_and_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "segments")
    postings = _postings(spark, sf_dir)
    write_posting_segments(postings, path, num_segments=4)

    files = sorted(
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    )
    assert 1 < len(files) <= 4

    # (1) within each file, (term, doc_id) runs are sorted; (2) term
    # ranges are disjoint across files
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["term", "doc_id"])
        terms = t.column("term").to_pylist()
        docs = t.column("doc_id").to_pylist()
        rows = list(zip(terms, docs))
        assert rows == sorted(rows), f"unsorted run in {f}"
        ranges.append((terms[0], terms[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping term ranges: {hi1!r} vs {lo2!r}"

    # content preserved exactly
    back = spark.read.parquet(path)
    a = postings.groupBy("term").count().collect()
    b = back.groupBy("term").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lookup_prunes_to_one_segment(spark, sf_dir, tmp_path):
    path = str(tmp_path / "segments2")
    write_posting_segments(_postings(spark, sf_dir), path, num_segments=4)

    got = lookup_term(spark, path, "spark")
    want = (
        _postings(spark, sf_dir).filter(F.col("term") == "spark").count()
    )
    assert got.count() == want
    # row-group stats admit the term in at most one segment file
    admitting = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        if os.path.basename(f).startswith(("_", ".")):
            continue
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.row_group(rg).num_columns)
                if meta.row_group(rg).column(i).path_in_schema == "term"
            )
            st = col.statistics
            if st.min <= "spark" <= st.max:
                admitting += 1
                break  # count files, not row groups
    assert admitting <= 1


def test_bm25_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Maintenance contract (mirror of the LSH index's
    test_append_to_index_equals_rebuild): ensure(existing) +
    append(batch) holds the same (term, doc_id, tf, dl) posting set
    and a BIT-EQUAL stats row as building the full-corpus index from
    scratch."""
    import shutil

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.sources.posting_sink import (
        append_to_bm25_index,
        ensure_bm25_index,
    )

    base = ensure_bm25_index(spark, sf_dir, slice_="existing")
    work = str(tmp_path / "bm25idx")
    shutil.copytree(base, work)
    batch = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    append_to_bm25_index(spark, work, batch)

    full = ensure_bm25_index(spark, sf_dir, slice_="full")
    got_postings = {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in spark.read.parquet(os.path.join(work, "postings")).collect()
    }
    want_postings = {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in spark.read.parquet(os.path.join(full, "postings")).collect()
    }
    assert got_postings == want_postings

    from minoan_athenaeum_spark.sources.posting_sink import bm25_stats

    got_stats = bm25_stats(spark, work).collect()[0]
    want_stats = bm25_stats(spark, full).collect()[0]
    # exact equality — integer-valued double sums merge losslessly
    # (the appended sidecar has 2 generations, the rebuild 1; the
    # merged reader values must still be bit-equal)
    assert spark.read.parquet(os.path.join(work, "stats")).count() == 2
    assert (got_stats.n_docs, got_stats.avgdl, got_stats.sum_dl) == (
        want_stats.n_docs,
        want_stats.avgdl,
        want_stats.sum_dl,
    )


def test_bm25_compact_equals_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Compaction contract (VERDICT r7 #4): three append generations
    accumulate delta files; compact_bm25_index rewrites them into
    fresh segments with (1) the posting MULTISET unchanged and equal
    to a full rebuild's, (2) the stats row untouched, and (3) the
    data-file count restored to <= num_segments (the LSM
    read-amplification fix, observable in the layout)."""
    import glob
    import shutil

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.sources.posting_sink import (
        append_to_bm25_index,
        compact_bm25_index,
        ensure_bm25_index,
    )

    def data_files(p):
        return [
            f
            for f in glob.glob(os.path.join(p, "*.parquet"))
            if not os.path.basename(f).startswith(("_", "."))
        ]

    base = ensure_bm25_index(spark, sf_dir, slice_="existing")
    work = str(tmp_path / "bm25idx_compact")
    shutil.copytree(base, work)
    pdir = os.path.join(work, "postings")
    n_base_files = len(data_files(pdir))

    docs = load_table(spark, sf_dir, "documents")
    arriving = docs.filter(F.col("doc_id") % 10 == 0)
    for r in (0, 10, 20):
        append_to_bm25_index(spark, work, arriving.filter(F.col("doc_id") % 30 == r))
    n_after_appends = len(data_files(pdir))
    assert n_after_appends > n_base_files  # generations visibly accumulate

    def postings_multiset(p):
        rows = spark.read.parquet(p).collect()
        out = {}
        for r in rows:
            k = (r.term, r.doc_id, r.tf, r.dl)
            out[k] = out.get(k, 0) + 1
        return out

    from minoan_athenaeum_spark.sources.posting_sink import bm25_stats

    pre = postings_multiset(pdir)
    stats_pre = bm25_stats(spark, work).collect()[0]
    assert spark.read.parquet(os.path.join(work, "stats")).count() == 4

    compact_bm25_index(spark, work, num_segments=4)
    assert len(data_files(pdir)) <= 4  # layout restored
    assert postings_multiset(pdir) == pre  # rows unchanged

    # sidecar generations collapse to ONE row; merged values unchanged
    assert spark.read.parquet(os.path.join(work, "stats")).count() == 1
    stats_post = bm25_stats(spark, work).collect()[0]
    assert tuple(stats_pre) == tuple(stats_post)

    # and all of it equals the from-scratch full build
    full = ensure_bm25_index(spark, sf_dir, slice_="full")
    assert postings_multiset(os.path.join(full, "postings")) == pre
    full_stats = bm25_stats(spark, full).collect()[0]
    assert (stats_post.n_docs, stats_post.avgdl, stats_post.sum_dl) == (
        full_stats.n_docs,
        full_stats.avgdl,
        full_stats.sum_dl,
    )


def test_bm25_index_empty_slice_raises(spark, tmp_path):
    """ADVICE r7: an empty documents slice must fail loudly, not
    ZeroDivisionError, and must not write a 0-doc stats table. Driven
    through the public ensure (the guard moved there with the r11
    harness rewrite): a corpus whose every doc_id is a batch id makes
    the 'existing' slice empty."""
    import pandas as pd
    import pytest

    from minoan_athenaeum_spark.sources.posting_sink import (
        bm25_index_path,
        ensure_bm25_index,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        pd.DataFrame(
            [(10, "alpha beta", "en", "a")],
            columns=["doc_id", "text", "lang", "source"],
        )
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    with pytest.raises(ValueError, match="empty documents slice"):
        ensure_bm25_index(spark, sf, slice_="existing")
    p = bm25_index_path(spark, sf, "existing")
    assert not os.path.exists(os.path.join(p, "stats"))
