#!/usr/bin/env python
"""Retry loop: land the quiet-host perf sweep the moment the gate opens.

The r11 close and the r12 session both found the same host mode: idle
steal ~0%, loadavg <1, but 3-23% hypervisor steal the moment all 32
cores go busy — which inflates perf_sweep.py's warmup anchor past its
0.25 s gate. v1 of this wrapper pre-probed steal with a 4 s 32-core
burn to avoid paying a JVM start per attempt; live running showed two
flaws (QUIET_WINDOW_LOG 22:05-00:20 UTC):

  1. the burn adds ~2.1 to the 1-min loadavg (32·(1−e^(−4/60))),
     tripping perf_sweep's own ≥1.5 loadavg refusal unless the wrapper
     then waits minutes for decay — by which time the window can close;
  2. the steal mode flickers on a SUB-MINUTE timescale (a 0.14% probe
     at 00:13:10 became an anchor refusal at 00:13:45), so a clean
     4 s probe does not predict a clean sweep start anyway.

v2 therefore drops the burn from the hot path: when the 1-min loadavg
is quiet, it just ATTEMPTS the sweep and lets perf_sweep's anchor gate
be the probe — the gate measures the exact quantity that must be clean,
costs ~40 s JVM per refusal, and leaves only a small loadavg shadow
that one interval absorbs. On success (artifact rewritten) it runs
bench.py once in the same window and stops. Every attempt and its
refusal line lands in QUIET_WINDOW_LOG.jsonl so the round can document
the refusals as r11 did.

Usage: python scripts/quiet_window_sweep.py [--interval-sec 300]
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

LOAD_GATE = 1.0  # 1-min loadavg below this = worth paying a JVM attempt


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
    sees the hypervisor's under-load throttling mode. Diagnostic tool
    (used manually / in SCALE.md measurements); NOT in the retry hot
    path — see module docstring for why."""
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
    ap.add_argument("--interval-sec", type=float, default=300)
    ap.add_argument("--max-hours", type=float, default=5)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        load1 = os.getloadavg()[0]
        if load1 >= LOAD_GATE:
            # a foreground job (replay, pytest, bench) owns the host —
            # skip cheaply, never launch a second JVM into it
            log_row({"attempt": "gate", "refused": "loadavg", "load1": round(load1, 2)})
        else:
            mtime0 = ARTIFACT.stat().st_mtime if ARTIFACT.exists() else 0
            r = subprocess.run(
                [sys.executable, str(REPO / "scripts" / "perf_sweep.py")],
                capture_output=True,
                text=True,
            )
            rewritten = ARTIFACT.exists() and ARTIFACT.stat().st_mtime > mtime0
            refusals = [
                l
                for l in (r.stdout + r.stderr).splitlines()
                if l.startswith("perf_sweep:")
            ]
            log_row(
                {
                    "attempt": "sweep",
                    "load1": round(load1, 2),
                    "rewritten": rewritten,
                    "refusal": refusals[-1:] or None,
                }
            )
            if rewritten:
                b = subprocess.run(
                    [sys.executable, str(REPO / "bench.py")],
                    capture_output=True,
                    text=True,
                )
                lines = [l for l in b.stdout.splitlines() if l.startswith("{")]
                log_row({"attempt": "bench", "json": lines[-1:] or None})
                return 0
        if args.once:
            return 1
        time.sleep(args.interval_sec)
    log_row({"attempt": "giveup", "reason": "max-hours reached"})
    return 1


if __name__ == "__main__":
    sys.exit(main())
