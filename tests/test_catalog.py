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


def test_doc_counts_match_registry():
    """COVERAGE.md / README.md quote the registry sizes; pin them to
    the live registry so the docs cannot drift (VERDICT r3 item 7)."""
    import os
    import re

    registry.load_catalog()
    n_q, n_o = len(registry.QUERIES), len(registry.ORACLES)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc in ("COVERAGE.md", "README.md"):
        with open(os.path.join(root, doc)) as f:
            text = f.read()
        for m in re.finditer(r"(\d+) registered quer", text):
            assert int(m.group(1)) == n_q, f"{doc}: stale query count"
        for m in re.finditer(r"(\d+) DuckDB-oracled", text):
            assert int(m.group(1)) == n_o, f"{doc}: stale oracle count"
