"""Catalog-wide ``count()`` smoke sweep.

Every catalog entry must survive ``df.count()`` — the plan shape where
the consumer DISCARDS all output columns. That is not a trivial twin of
``collect()``: discarding the output invites Catalyst's column pruning
to walk through every operator in the plan, and an operator carrying
duplicated attribute IDs (two sides of a cogroup/self-join built from
one shared parent DataFrame) can have a column it still needs pruned
away when the duplicate resolves against the other side.

Found live: ``asof_view_purchase_cogroup`` built both cogroup sides
from ONE ``load(events)`` frame; ``collect()`` was green everywhere
(oracle parity, the invariance sweep, the sf0.1 sweep) while
``count()`` crashed the Python worker with a KeyError because the
right child had been pruned to ``[user_id]``. Users count results all
the time — a catalog entry that only works when fully collected is
broken. Default-deny, same posture as test_plan_hygiene /
test_empty_input / test_partition_invariance: new operators are swept
automatically on registration.
"""

from __future__ import annotations

import pytest

# r13 lane split (VERDICT item 2): catalog-wide strategy/hygiene sweep —
# slow lane (`-m slow`); excluded from the default verify lane by pytest.ini.
pytestmark = pytest.mark.slow

from live_data_spark.catalog import catalog

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(catalog()))
def test_catalog_entry_survives_count(spark, name):
    spec = catalog()[name]
    # The value is already pinned by oracle parity / empty-input sweeps;
    # this sweep only asserts the pruned-output plan EXECUTES.
    assert spec.spark(spark, SF_SMOKE).count() >= 0
