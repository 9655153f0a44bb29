"""Guard against engine-specific result *types* silently diverging even
when values match.

DuckDB widens integer aggregates: ``SUM(BIGINT)`` returns HUGEINT
(int128) and ``count_if`` returns HUGEINT too. The driver's value hash
is type-sensitive, so an oracle column arriving as int128/DECIMAL
hash-mismatches a Spark int64 column that holds identical values (this
was the single red driver row in round 2: ``pipeline_pack_sequences``,
VERDICT.md "What's wrong" #1). The rule, enforced here for every
registered oracle: result columns must DESCRIBE to a 64-bit-safe type —
wrap integer SUM/count_if in ``CAST(... AS BIGINT)`` and decimal sums in
``CAST(... AS DOUBLE)``.
"""

from __future__ import annotations

import pytest

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.testing import duckdb_connect

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)

# Types that round-trip to the driver compare as plain int64 / float64 /
# str / bool — never int128, DECIMAL, or INTERVAL.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "BOOLEAN", "DATE"}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_result_types_are_64bit_safe(con, name):
    rows = con.execute("DESCRIBE " + SPECS[name].oracle).fetchall()
    bad = [(col, typ) for col, typ, *_ in rows if typ.upper() not in ALLOWED]
    assert not bad, (
        f"{name}: oracle result columns with driver-hash-unsafe DuckDB types "
        f"{bad}; add CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
    )
