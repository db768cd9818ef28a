"""bench.py contamination metadata: pure-Python pins (no Spark).

The r9 lesson: a loaded host inflated the committed headline by 10% and
only a human dividing two anchors spotted it. These arms pin the
machinery that now makes that machine-readable — the committed-anchor
reader and the suspect rule — against the repo's real artifacts.
"""

from __future__ import annotations

import json
from pathlib import Path

import bench

REPO = Path(__file__).resolve().parents[1]


def test_committed_anchor_reader_unwraps_driver_envelope():
    """Driver artifacts wrap bench.py's stdout under 'parsed'; the reader
    must see through it and return (name, sec) per anchor-bearing round
    at the requested SF, in round order."""
    anchors = bench._committed_anchors(0.1)
    # r7+ artifacts carry anchors; the repo has several committed
    assert len(anchors) >= 2
    names = [n for n, _ in anchors]
    assert names == sorted(names)  # round order (glob-sorted)
    assert all(n.startswith("BENCH_r") and n.endswith(".json") for n in names)
    assert all(s > 0 for _, s in anchors)
    # every returned file really is at the requested SF
    for name, _ in anchors:
        d = json.loads((REPO / name).read_text())
        assert (d.get("parsed") or d).get("sf") == 0.1


def test_committed_anchor_reader_empty_at_unknown_sf():
    assert bench._committed_anchors(123.456) == []


def test_suspect_rule_flags_r9_retroactively():
    """The >1.2x-of-best rule must flag the known-contaminated r9 anchor
    and pass the known-idle r8 one — the calibration case the rule was
    designed from."""
    anchors = dict(bench._committed_anchors(0.1))
    if "BENCH_r09.json" not in anchors or "BENCH_r08.json" not in anchors:
        import pytest

        pytest.skip("r8/r9 artifacts not present")
    best = min(anchors.values())
    assert anchors["BENCH_r09.json"] / best > 1.2  # loaded run flags
    assert anchors["BENCH_r08.json"] / best <= 1.2  # idle run passes
