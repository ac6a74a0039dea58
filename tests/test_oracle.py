"""Every registered query must hash-match its DuckDB oracle (driver replica)."""

from __future__ import annotations

import pytest

from flink_cookbook_spark.registry import all_specs
from tests.oracle_harness import compare, duckdb_connection


def _params():
    return [pytest.param(spec, id=name) for name, spec in sorted(all_specs().items())]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", _params())
def test_query_matches_oracle(spec, spark, sf_dir, con):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only contract
        return
    # require_rows = vacuous-green guard at WHATEVER SF this suite runs
    # at (the registry lint in test_robustness.py covers sf0.01 only
    # and skips when those fixtures are absent): a 0-row == 0-row
    # oracle match verifies nothing about the query's logic, so any
    # oracled query not explicitly whitelisted must produce rows here.
    from tests.test_robustness import vacuous_ok

    problems = compare(
        df, con, spec.oracle, spec.name, require_rows=not vacuous_ok(spec.name, sf_dir)
    )
    assert not problems, "\n".join(problems)
