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
    # r13 inherited-state fix: variant artifacts (the driver's 8-core
    # BENCH_r12_c8.json) must stay OUT of the probe history — they run
    # at a different core count and their unmatched round number
    # misordered the walk
    import re

    assert all(re.fullmatch(r"BENCH_r\d+\.json", n) for n in names)
    assert all(s > 0 for _, s in anchors)
    # every returned file really is at the requested SF
    for name, _ in anchors:
        d = json.loads((REPO / name).read_text())
        assert (d.get("parsed") or d).get("sf") == 0.1


def test_committed_anchor_reader_empty_at_unknown_sf():
    assert bench._committed_anchors(123.456) == []


def test_drift_rule_and_empty_history():
    """_drift: (None, False) with no committed history; flags only >1.2x
    of the BEST committed value, on the unrounded ratio."""
    assert bench._drift(0.5, []) == (None, False)
    hist = [("BENCH_r01.json", 0.30), ("BENCH_r02.json", 0.20)]
    drift, suspect = bench._drift(0.241, hist)
    assert suspect  # 0.241/0.20 = 1.205 > 1.2 (rounds to 1.2 — must still flag)
    assert drift["vs_best"] == "BENCH_r02.json"
    assert drift["vs_newest"] == "BENCH_r02.json"
    drift, suspect = bench._drift(0.24, hist)
    assert not suspect  # exactly 1.2 passes
    assert drift["factor_vs_best"] == 1.2


def test_canary_probe_reader_round_trips():
    """The canary reader shares the anchor reader's envelope/SF logic;
    rounds before r11 carry no canary, so history grows from r11 on and
    is empty at never-benched SFs. If any canary IS committed its shape
    must be the pinned one (constants are part of the cross-round
    contract)."""
    canaries = dict(bench._committed_probe(0.1, "canary"))
    assert all(s > 0 for s in canaries.values())
    for name in canaries:
        d = json.loads((REPO / name).read_text())
        d = d.get("parsed") or d
        assert d["canary"]["shape"] == (
            f"range({bench._CANARY_ROWS})->exchange(%{bench._CANARY_KEYS})->agg"
        )
    assert bench._committed_probe(123.456, "canary") == []


def test_committed_canaries_pool_across_sf_and_filter_parallelism(tmp_path, monkeypatch):
    """r12 reader: canary history pools across ALL SFs (the probe never
    touches SF data) but only at the SAME defaultParallelism — the plan
    fans out over it, so rows from a different core count are not
    comparable. Rows predating the `parallelism` field count as this
    host's historical 32."""
    rows = {
        # pre-r12 artifact: no parallelism field -> treated as 32
        "BENCH_r11.json": {"sf": 0.1, "canary": {"sec": 0.6}},
        # r12+ artifacts at two SFs and two core counts
        "BENCH_r12.json": {
            "parsed": {"sf": 0.01, "canary": {"sec": 0.5, "parallelism": 32}}
        },
        "BENCH_r13.json": {"sf": 0.1, "canary": {"sec": 0.2, "parallelism": 16}},
    }
    for name, d in rows.items():
        (tmp_path / name).write_text(json.dumps(d))
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    at32 = bench._committed_canaries(32)
    assert at32 == [("BENCH_r11.json", 0.6), ("BENCH_r12.json", 0.5)]
    # a core-count change invalidates the pre-field rows too
    assert bench._committed_canaries(16) == [("BENCH_r13.json", 0.2)]


def test_loadavg_detector_flags_r10_retroactively():
    """BENCH_r10 ran at pre-JVM loadavg 5.09 and slipped past the
    anchor-only rule; the direct loadavg gate must catch that artifact."""
    import pytest

    f = REPO / "BENCH_r10.json"
    if not f.exists():
        pytest.skip("r10 artifact not present")
    d = json.loads(f.read_text())
    d = d.get("parsed") or d
    load1 = d["host"]["loadavg_pre_jvm"][0]
    assert load1 >= bench._LOADAVG_SUSPECT  # the gate fires
    # …and the anchor-only rule indeed did NOT (why the canary exists)
    assert d["host_load_suspect"] is False


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


def test_steal_pct_math_and_none_paths():
    """steal share of elapsed jiffies; None when either snapshot is
    missing (non-Linux) or nothing elapsed."""
    pre = [100, 0, 50, 800, 10, 0, 5, 20, 0]
    post = [200, 0, 70, 1500, 12, 0, 6, 60, 0]  # +40 steal of +863 total
    got = bench._steal_pct(pre, post)
    assert got == round(100 * 40 / 863, 2)
    assert bench._steal_pct(None, post) is None
    assert bench._steal_pct(pre, None) is None
    assert bench._steal_pct(pre, pre) is None  # zero elapsed
    # the live reader returns a 9-field snapshot on this host
    snap = bench._proc_stat_snapshot()
    assert snap is None or len(snap) == 9


def test_steal_detector_threshold_calibration():
    """Detector 4: fires at >=3% run-steal, stays quiet at the measured
    at-rest share (0.45%) and when the counter is unavailable."""
    assert bench._STEAL_SUSPECT_PCT == 3.0
    # the live r11 readings that calibrated it
    assert 0.45 < bench._STEAL_SUSPECT_PCT < 4.87
