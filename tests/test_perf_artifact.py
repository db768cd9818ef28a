"""Structural tripwire for the committed full-catalog perf artifact.

PERF_SF01.json (written by scripts/perf_sweep.py) extends perf
visibility from bench.py's 16 headline queries to every catalog entry.
The RE-TIMING half of the tripwire is `perf_sweep.py --check` (a
~10-minute sf0.1 sweep has no place in the unit suite; run it before a
round closes). This module pins what CAN be checked cheaply:

- the artifact exists, parses, and names the pinned anchor;
- every artifact entry still exists in the catalog (no zombie rows);
- the catalog is covered (≥90% — a few mid-round additions may precede
  the next sweep rewrite, but forgetting the sweep entirely fails);
- per-entry ratios are consistent with their absolute seconds and the
  anchor (the ratio column is the host-load-invariant signal the
  tripwire compares, so it must actually BE sec/anchor_sec).
"""

from __future__ import annotations

import json
from pathlib import Path

ARTIFACT = Path(__file__).resolve().parents[1] / "PERF_SF01.json"


def test_perf_artifact_structure_and_coverage():
    from live_data_spark.catalog import catalog

    data = json.loads(ARTIFACT.read_text())
    assert data["anchor"]["query"] == "dedup_exact"
    anchor = data["anchor"]["sec"]
    assert anchor > 0
    entries = data["entries"]
    cat = set(catalog())
    assert set(entries) <= cat, sorted(set(entries) - cat)
    coverage = len(set(entries) & cat) / len(cat)
    assert coverage >= 0.90, (
        f"perf artifact covers {coverage:.0%} of the catalog — "
        "re-run scripts/perf_sweep.py"
    )
    for name, rec in entries.items():
        assert rec["sec"] >= 0, name
        assert abs(rec["ratio"] - rec["sec"] / anchor) <= 0.01 + 0.005 * rec["ratio"], name
