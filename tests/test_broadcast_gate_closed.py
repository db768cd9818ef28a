"""Catalog-wide broadcast-gate-closed sweep — run the 100× PLAN SHAPE.

Every size-gated broadcast in the repo (catalog.broadcast_dim,
catalog.gated_pair_sides) exists to DEGRADE at scale: above the 32 MiB
parquet-footer gate the hint disappears and the plan falls back to
shuffle joins + AQE + runtime bloom pruning. The plan tests pin a few
named fallbacks; this sweep executes the degradation CATALOG-WIDE by
running every entry twice at sf0.001:

  1. default config (gates open at this SF, auto-broadcast on) — the
     plans the oracle parity suite verified;
  2. every gate forced SHUT (catalog.BROADCAST_GATE_BYTES patched to
     −1) AND Spark's own auto-broadcast disabled (static + AQE
     autoBroadcastJoinThreshold = −1) — the join strategies the SAME
     code would choose on a corpus 1000× past every gate,

and asserts the canonicalized results are identical. This is the
claim "the 100× plan degrades to SMJ without changing answers" as
executed code rather than prose, and a default-deny guard: a new
operator whose result depends on its join STRATEGY (broadcast-order
first()/any_value grabs, strategy-dependent partial-agg association)
fails here even though oracle parity and the partition-layout sweep
pass.

Explicit ``F.broadcast`` hints on fixed-domain frames (nation/region,
calendar grids, k-row centroid frames, 1-row aggregates) survive both
arms BY DESIGN — hints bypass the threshold, and those frames never
scale with SF. That is exactly the deliberate split SCALE.md §1
documents; non-equi joins keep their pinned BNLJ shape through the
hint rather than collapsing to CartesianProduct.
"""

from __future__ import annotations

import pytest

# r13 lane split (VERDICT item 2): catalog-wide strategy/hygiene sweep —
# slow lane (`-m slow`); excluded from the default verify lane by pytest.ini.
pytestmark = pytest.mark.slow

import live_data_spark.catalog as cat
from conftest import canon_rows as _canon
from live_data_spark.catalog import catalog

SF_SMOKE = "/root/testdata/sf0.001"


_THRESH_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def test_gate_patch_actually_closes_the_gate(spark, monkeypatch):
    """Vacuity guard for the sweep itself: the helpers must read the gate
    constant at CALL time, so patching the module global genuinely
    removes the hint. If a refactor re-bakes the constant into a
    def-time default, the sweep would silently compare two identical
    runs — this test fails instead."""
    df = cat.load(spark, SF_SMOKE, "nation")
    open_plan = cat.broadcast_dim(df, SF_SMOKE, "nation")
    assert "ResolvedHint" in open_plan._jdf.queryExecution().analyzed().toString()
    monkeypatch.setattr(cat, "BROADCAST_GATE_BYTES", -1)
    closed_plan = cat.broadcast_dim(df, SF_SMOKE, "nation")
    assert "ResolvedHint" not in closed_plan._jdf.queryExecution().analyzed().toString()
    a, b = cat.gated_pair_sides(df, SF_SMOKE, "nation", 1)
    assert "ResolvedHint" not in b._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("name", sorted(catalog()))
def test_catalog_entry_survives_closed_broadcast_gates(spark, name, monkeypatch):
    spec = catalog()[name]

    def run():
        df = spec.spark(spark, SF_SMOKE)
        return _canon([tuple(r) for r in df.collect()], df.columns)

    base = run()

    old = {}
    for k in _THRESH_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        monkeypatch.setattr(cat, "BROADCAST_GATE_BYTES", -1)
        for k in _THRESH_CONFS:
            spark.conf.set(k, "-1")
        closed = run()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert closed == base, f"{name}: result depends on the broadcast join strategy"
