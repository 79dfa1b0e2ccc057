"""Differential test: every registered query with an oracle must match
DuckDB at sf0.001 (fast) -- the same check the driver runs at sf0.01.
Queries without an oracle must at least execute and return a schema.
"""

from __future__ import annotations

import pytest

from hq_master_data_warehouse_spark import registry
from tests.oracle import compare, duckdb_conn

registry.load_catalog()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = registry.QUERIES[name](spark, SF)
    if name in registry.ORACLES:
        compare(df, con, registry.ORACLES[name])
    else:
        # rows-only: runs, has a schema, row count is non-negative
        assert df.columns
        assert df.count() >= 0
