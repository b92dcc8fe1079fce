"""Every declared query must exactly match its DuckDB oracle (driver mirror).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact gate scale.
"""

from __future__ import annotations

import pytest

from sample_deepbook_margin_dune_dbt_spark.queries import (
    ALL_QUERIES,
    DRIVER_WINDOW,
    FULL_QUERIES,
)
from tests.oracle_harness import compare, duckdb_connection

# the local gate covers the full inventory, including EXTRA_QUERIES the
# driver window excludes
ORACLE_QUERIES = sorted(n for n, (_, sql) in FULL_QUERIES.items() if sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, (_, sql) in FULL_QUERIES.items() if sql is None)


def test_driver_declaration_fits_window():
    """The round-1 driver recorded rows for only the first 50 declared
    queries; everything declared must fit that window or it goes unverified."""
    assert len(ALL_QUERIES) <= DRIVER_WINDOW


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = FULL_QUERIES[name]
    problems = compare(fn(spark, sf_dir), duck, sql, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    fn, _ = FULL_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
