"""Property-based pin for the merge/upsert operator: random base and
update keysets (with overlaps, inserts, deletes, and partial-null
updates) merged by Spark must equal a pure-Python reference merge."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from minoan_athenaeum_spark.operators.merge import merge_upsert

base_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),           # key
        st.integers(min_value=-100, max_value=100),       # v1
        st.sampled_from(["a", "b", "c"]),                 # v2
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: r[0],
)
update_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),           # key (some miss base)
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        st.one_of(st.none(), st.sampled_from(["x", "y"])),
        st.booleans(),                                    # delete marker
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: r[0],
)


def reference_merge(base, updates):
    out = {}
    for k, v1, v2 in base:
        out[k] = (v1, v2)
    for k, u1, u2, is_del in updates:
        if k in out:
            if is_del:
                del out[k]
                continue
            b1, b2 = out[k]
            out[k] = (u1 if u1 is not None else b1, u2 if u2 is not None else b2)
        else:
            if is_del:
                continue
            out[k] = (u1, u2)
    return {(k, *v) for k, v in out.items()}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=base_rows, updates=update_rows)
def test_merge_matches_reference(spark, base, updates):
    b = spark.createDataFrame(base, "k long, v1 long, v2 string")
    u = spark.createDataFrame(updates, "k long, v1 long, v2 string, is_del boolean")
    got = {
        tuple(r)
        for r in merge_upsert(b, u, "k", ["v1", "v2"], delete_col="is_del").collect()
    }
    assert got == reference_merge(base, updates)


def test_duplicate_update_keys_rejected(spark):
    # SQL MERGE raises on multiple matches; merge_upsert must too, not
    # silently fan base rows out through the full-outer join.
    import pytest

    b = spark.createDataFrame([(1, 10, "a")], "k long, v1 long, v2 string")
    u = spark.createDataFrame(
        [(1, 11, "b", False), (1, 12, "c", False)],
        "k long, v1 long, v2 string, is_del boolean",
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(b, u, "k", ["v1", "v2"], delete_col="is_del").collect()
