"""Sources robustness: schema evolution across parquet parts —
mergeSchema reads a directory whose files disagree on columns (the
"crawl N added a field" reality of long-lived datasets) and must
union the schemas with nulls for the missing side, matching DuckDB's
union_by_name over the same files."""

from __future__ import annotations

import duckdb


def test_merge_schema_across_parts(spark, tmp_path):
    base = str(tmp_path / "evolving.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("overwrite").parquet(base + "/part=v1")
    spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, name string, score long"
    ).write.mode("overwrite").parquet(base + "/part=v2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "name", "score", "part"}
    got = {
        (r.id, r.name, r.score)
        for r in df.select("id", "name", "score").collect()
    }

    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            f"SELECT id, name, score FROM read_parquet('{base}/*/*.parquet',"
            " union_by_name=true)"
        ).fetchall()
    }
    assert got == want
    assert (1, "a", None) in got and (3, "c", 30) in got


def test_new_column_filter_is_null_safe(spark, tmp_path):
    # filters on the evolved column must not resurrect pre-evolution
    # rows (null never satisfies score > 0) and must still prune
    base = str(tmp_path / "evolving2.parquet")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        base + "/part=v1"
    )
    spark.createDataFrame(
        [(2, "b", 5), (3, "c", -1)], "id long, name string, score long"
    ).write.parquet(base + "/part=v2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert {r.id for r in df.where("score > 0").collect()} == {2}
    assert {r.id for r in df.where("score IS NULL").collect()} == {1}
