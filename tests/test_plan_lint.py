"""Full-registry plan lint: EVERY registered query's physical plan is
checked for the one shape that is never acceptable in this engine --
an unbounded CartesianProduct.  (Broadcast nested-loop joins of 1-row
scalar aggregates are the sanctioned scalar-join shape and are NOT
flagged; targeted per-family expectations -- broadcast pins,
TakeOrdered, partial aggregation -- live in tests/test_plans.py.)

This is the registry-wide safety net: a Spark upgrade or a refactor
that silently degrades any of the 280+ plans to a cartesian fails CI
here even if the query has no dedicated plan pin.
"""

from __future__ import annotations

import pytest

from hq_master_data_warehouse_spark import registry

registry.load_catalog()

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_cartesian_product_anywhere(spark, name):
    df = registry.QUERIES[name](spark, SF)
    # pre-execution physical plan: cheap (no job runs for most
    # queries; iterative operators run their construction-time jobs
    # at sf0.001, which the catalog test pays anyway)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name} compiles to a CartesianProduct"
    )
