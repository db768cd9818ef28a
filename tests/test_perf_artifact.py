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


def _perf_sweep_module():
    import importlib.util

    path = ARTIFACT.parent / "scripts" / "perf_sweep.py"
    spec = importlib.util.spec_from_file_location("perf_sweep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_perf_check_streaming_entries_use_stall_ceiling_not_ratio():
    """Streaming entries carry fixed availableNow-drain machinery latency
    that inflates under host contention WITHOUT scaling the anchor query,
    so the ratio tripwire false-positives on them (the round-7
    pysource_stream_batch_parity 22.8→73.8 adjudication). Pin the check's
    arms: a contended streaming entry (huge ratio, sane seconds) passes; a
    genuinely stalled one (seconds past the ceiling) still flags; a
    non-streaming ratio inflation flags as before."""
    ps = _perf_sweep_module()
    base = {
        "entries": {
            "stream_twin": {"sec": 5.0, "ratio": 22.8},
            "batch_q": {"sec": 1.0, "ratio": 4.0},
        }
    }
    fresh_contended = {
        "entries": {
            "stream_twin": {"sec": 16.0, "ratio": 73.8},  # the r7 false positive
            "batch_q": {"sec": 1.1, "ratio": 4.4},
        }
    }
    assert ps.flag_entries(base, fresh_contended, {"stream_twin"}) == []
    fresh_stalled = {
        "entries": {
            "stream_twin": {"sec": ps.STREAMING_STALL_SEC + 1, "ratio": 300.0},
            "batch_q": {"sec": 3.1, "ratio": 12.5},  # >3x ratio: real regression
        }
    }
    flagged = {n for n, *_ in ps.flag_entries(base, fresh_stalled, {"stream_twin"})}
    assert flagged == {"stream_twin", "batch_q"}
    # without the streaming exemption the contended run would have flagged
    assert {n for n, *_ in ps.flag_entries(base, fresh_contended, set())} == {
        "stream_twin"
    }


def test_perf_sweep_detects_foreign_spark_drivers(monkeypatch):
    """other_spark_drivers() must spot a live SparkSubmit JVM in ps output
    and stay silent otherwise (and never crash when ps is unavailable)."""
    import subprocess

    ps = _perf_sweep_module()

    class R:
        def __init__(self, out):
            self.stdout = out

    monkeypatch.setattr(
        ps.subprocess,
        "run",
        lambda *a, **k: R("bash\njava -cp ... org.apache.spark.deploy.SparkSubmit pyspark-shell\n"),
    )
    hits = ps.other_spark_drivers()
    assert len(hits) == 1 and "SparkSubmit" in hits[0]
    monkeypatch.setattr(ps.subprocess, "run", lambda *a, **k: R("bash\nvim\n"))
    assert ps.other_spark_drivers() == []

    def boom(*a, **k):
        raise OSError("no ps")

    monkeypatch.setattr(ps.subprocess, "run", boom)
    assert ps.other_spark_drivers() == []


def test_sweep_refuses_on_busy_loadavg_before_jvm(monkeypatch, capsys):
    """The r11 quiet-host gate: a busy pre-JVM loadavg refuses the sweep
    in milliseconds (no JVM start), returning None -> exit 2. The anchor
    half of the gate needs Spark and stays a live-tool behavior; this
    pins the half that can be checked purely."""
    ps = _perf_sweep_module()
    monkeypatch.setattr("os.getloadavg", lambda: (9.9, 9.9, 9.9))
    assert ps.sweep(force=False) is None
    assert "loadavg" in capsys.readouterr().out
    assert ps.ANCHOR_GATE_SEC == 0.25 and ps.LOADAVG_GATE == 1.5
