"""Catalog-wide physical-plan hygiene sweep.

Builds (never executes) every catalog entry's plan at sf0.001 and asserts
the anti-patterns that silently kill 100 TB runs never creep in:

- no row-at-a-time Python UDFs (``BatchEvalPython``) — Python is allowed
  only Arrow-batched (``ArrowEvalPython`` / FlatMapGroupsInPandas etc.)
- no cartesian products except the known 1-row cut-frame cross joins
  (those appear as BroadcastNestedLoopJoin over a 1-row aggregate)

This complements tests/test_plans.py's per-query shape pins with a
default-deny guard over the WHOLE surface: a new operator that slips an
interpreted UDF or an accidental cross join into the catalog fails here
without anyone having to remember to pin it.
"""

from __future__ import annotations

import pytest

from live_data_spark.catalog import catalog

# entries whose plan legitimately contains a CartesianProduct node
# (none today — 1-row frames go through BroadcastNestedLoopJoin)
CARTESIAN_OK: set[str] = set()

ALL = sorted(catalog())


@pytest.mark.parametrize("name", ALL)
def test_no_plan_antipatterns(spark, sf_dir, name):
    df = catalog()[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
