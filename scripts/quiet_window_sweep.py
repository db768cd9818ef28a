#!/usr/bin/env python
"""Retry loop: land the quiet-host perf sweep the moment the gate opens.

The r11 close and the r12 open both found the same host mode: idle steal
~0%, loadavg <1, but 6-10%% hypervisor steal the moment all 32 cores go
busy (measured 7.7%% at r12 open) — which inflates the warmup anchor past
perf_sweep.py's 0.25 s gate. Spinning up a Spark JVM just to be refused
costs ~30 s per attempt, so this wrapper pre-probes WITHOUT a JVM:

  1. cheap probe: 32 busy processes for 4 s, steal share from /proc/stat
  2. only if steal < STEAL_GATE and loadavg < LOAD_GATE: run
     scripts/perf_sweep.py (which still self-gates on the real anchor —
     this wrapper never weakens the gate, it only avoids pointless JVMs)
  3. on success (artifact rewritten): run bench.py once on the same
     window and stop
  4. every attempt (probe refusal or sweep refusal) is appended to
     QUIET_WINDOW_LOG so the round can document refusals as r11 did

Usage: python scripts/quiet_window_sweep.py [--interval-sec 600]
       [--max-hours 5]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
ARTIFACT = REPO / "PERF_SF01.json"
LOG = REPO / "QUIET_WINDOW_LOG.jsonl"

STEAL_GATE = 2.0  # pct under full load; sweep needs a genuinely clean window
LOAD_GATE = 1.0  # 1-min loadavg before we even burn


def _burn(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        x += 1


def _stat_snap() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return sum(v), v[7]


def probe_steal_under_load(seconds: float = 4.0) -> float:
    """Steal share (pct) while all cores are busy — the only probe that
    sees the hypervisor's under-load throttling mode."""
    n = os.cpu_count() or 32
    stop = time.time() + seconds + 0.5
    procs = [mp.Process(target=_burn, args=(stop,)) for _ in range(n)]
    t0, s0 = _stat_snap()
    for p in procs:
        p.start()
    time.sleep(seconds)
    t1, s1 = _stat_snap()
    for p in procs:
        p.join()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def log_row(row: dict) -> None:
    row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with LOG.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval-sec", type=float, default=600)
    ap.add_argument("--max-hours", type=float, default=5)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        load1 = os.getloadavg()[0]
        if load1 >= LOAD_GATE:
            log_row({"attempt": "probe", "refused": "loadavg", "load1": round(load1, 2)})
        else:
            steal = probe_steal_under_load()
            if steal >= STEAL_GATE:
                log_row(
                    {
                        "attempt": "probe",
                        "refused": "steal_under_load",
                        "steal_pct": round(steal, 2),
                        "load1": round(load1, 2),
                    }
                )
            else:
                # the probe itself poisons the next gate: 32 busy procs
                # for 4 s add ~2.1 to the 1-min loadavg (32·(1−e^(−4/60))),
                # which trips perf_sweep's own ≥1.5 refusal — measured
                # live at r12 open (0.12 before probe, 2.24 at sweep
                # start). Wait out the exponential decay before
                # launching; steal state rarely flips inside 2 minutes.
                decay_deadline = time.time() + 240
                while (
                    os.getloadavg()[0] >= LOAD_GATE
                    and time.time() < decay_deadline
                ):
                    time.sleep(15)
                if os.getloadavg()[0] >= LOAD_GATE:
                    # shadow never cleared — something else started
                    # (e.g. a foreground replay); do NOT launch into it
                    log_row(
                        {
                            "attempt": "probe",
                            "refused": "loadavg_after_decay_wait",
                            "load1": round(os.getloadavg()[0], 2),
                        }
                    )
                    if args.once:
                        return 1
                    time.sleep(args.interval_sec)
                    continue
                mtime0 = ARTIFACT.stat().st_mtime if ARTIFACT.exists() else 0
                r = subprocess.run(
                    [sys.executable, str(REPO / "scripts" / "perf_sweep.py")],
                    capture_output=True,
                    text=True,
                )
                rewritten = (
                    ARTIFACT.exists() and ARTIFACT.stat().st_mtime > mtime0
                )
                log_row(
                    {
                        "attempt": "sweep",
                        "steal_pct_probe": round(steal, 2),
                        "load1": round(load1, 2),
                        "rewritten": rewritten,
                        "tail": (r.stdout + r.stderr).strip().splitlines()[-1:],
                    }
                )
                if rewritten:
                    b = subprocess.run(
                        [sys.executable, str(REPO / "bench.py")],
                        capture_output=True,
                        text=True,
                    )
                    lines = [
                        l for l in b.stdout.splitlines() if l.startswith("{")
                    ]
                    log_row({"attempt": "bench", "json": lines[-1:] or None})
                    return 0
        if args.once:
            return 1
        time.sleep(args.interval_sec)
    log_row({"attempt": "giveup", "reason": "max-hours reached"})
    return 1


if __name__ == "__main__":
    sys.exit(main())
