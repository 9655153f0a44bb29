"""The core correctness gate, locally: every registered query with an
oracle must match DuckDB bit-for-bit at sf0.001 (the driver re-runs the
same contract at sf0.01). Oracle-less queries must at least execute and
return a stable schema.
"""

from __future__ import annotations

import pytest

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.testing import check_query_against_oracle

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    spec = SPECS[name]
    problems = check_query_against_oracle(spark, sf_dir, spec.fn, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
