#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each headline query is executed end-to-end (materialized via a noop write —
forces full evaluation including shuffles/joins without driver-side collect
of wide rows). Per-query time is the MIN over SPARK_GRAFT_BENCH_RUNS (default 5)
back-to-back runs: the first
run of a plan pays one-time Janino/JIT compilation of its generated code
(~1-3 s for wide aggregates) and is exposed to transient host load; a
long-lived production session amortizes both, so steady-state is the
representative engine number. Five runs give four post-codegen samples:
measured cross-session spread on this shared host reaches 2-3× on
identical plans (BENCH_r06 note), and min() over four steady-state
samples is markedly more stable than over the two that best-of-3 leaves.
Total is the sum of per-query times; the JSON records runs_per_query
for transparency.

Host-variance anchor (SCALE.md "Measured host variance"): absolute times
on this shared host drift 2-3× across sessions with zero code change, so
the JSON also reports a pinned ANCHOR query (dedup_exact — small, stable,
plan-pinned, unchanged since round 1) measured twice (before and after
the main loop, min taken so a load burst during either window is
discounted) plus per-query RATIOS to that anchor. Cross-round
comparisons should read the `ratios` column: host load multiplies the
anchor and the query alike, so the ratio cancels it to first order,
while a genuine plan regression moves only its own ratio.

Contamination is machine-readable (BENCH_r09 lesson — its +24% anchor
drift needed a human dividing two files to spot): the JSON carries
`host` (loadavg sampled BEFORE the JVM starts — the external-load
signal; our own executors dominate loadavg once the run begins — plus
cpu count) and `anchor_drift` (this run's anchor vs BOTH the newest
committed BENCH_r*.json at the same SF — the round-over-round read — and
the best/lowest committed anchor — the idle-host reference, since the
newest round may itself have run loaded). `host_load_suspect` is true
when ANY of four independent detectors fires (`suspect_reasons` names
the ones that did); absolute totals in a suspect run overstate cost and
only the ratios should be read:

  1. anchor drift — the single-stage anchor ran >20% slower than the
     best committed anchor.
  2. canary drift — the SHUFFLE canary ran >20% slower than the best
     committed canary. BENCH_r10 proved detector 1 alone is blind to
     the hypervisor-steal mode this host exhibits: 32-way shuffle
     stages slowed 2-4× while the 0.2 s single-stage anchor moved <16%
     (too small/serial to feel multi-core contention). The canary is a
     fixed synthetic 2-stage plan — 32-way range scan, ~4M-row hash
     exchange on a ~1M-key column, final aggregate — sized to keep all
     cores busy across a real exchange, independent of SF, timed
     before and after the main loop exactly like the anchor.
  3. pre-JVM loadavg — the 1-minute loadavg sampled before the JVM
     starts is >= 1.5 (the SCALE.md §18 quiet-host rule). Detectors
     1-2 compare against committed history; this one needs none, and
     it fires on BENCH_r10's recorded 5.09 retroactively.
  4. hypervisor steal — /proc/stat steal share across the run >= 3%.
     Needs no history either, and it catches the mode the other three
     all missed live in r11: anchor 0.218 (min-of-N dodges
     INTERMITTENT steal), loadavg 1.11, no canary history yet — but
     steal 4.87% across the run and every shuffle-heavy ratio ~2×
     inflated. Calibration: 0.45% at rest vs 4.9-10.4% in the
     degraded window on this host; 3% splits those modes with margin.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from live_data_spark.catalog import catalog  # noqa: E402
from live_data_spark.session import get_spark  # noqa: E402


def _committed_probe(sf, field: str) -> list[tuple[str, float]]:
    """(filename, sec) for the pinned probe `field` (the SF-bound
    "anchor"; the SF-free canary uses _committed_canaries instead) per
    committed BENCH_r*.json at the same SF, round order.
    Two baselines matter: the NEWEST (the verdict-to-verdict comparison)
    and the BEST/lowest (the idle-host reference — the newest round may
    itself have run loaded, as BENCH_r09 and BENCH_r10 did)."""
    found = []
    for f in _round_bench_files():
        try:
            d = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps bench.py's stdout line under "parsed"
        d = d.get("parsed") or d
        sec = (d.get(field) or {}).get("sec")
        if d.get("sf") == sf and sec:
            found.append((f.name, float(sec)))
    return found


def _round_bench_files() -> list[Path]:
    """Committed per-round bench artifacts, STRICTLY ``BENCH_r<N>.json``,
    in numeric round order. Numeric (not filename) order keeps r100
    after r99; the strict-name filter keeps variant artifacts out of the
    probe history — the driver's 8-core run landed as BENCH_r12_c8.json
    (r13 inherited state), which the old ``BENCH_r*.json`` glob swept
    into the anchor baseline at a different core count and sorted FIRST
    (its round regex didn't match → -1)."""
    out = []
    for f in Path(_REPO).glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f.name)
        if m:
            out.append((int(m.group(1)), f))
    return [f for _, f in sorted(out)]


def _committed_anchors(sf) -> list[tuple[str, float]]:
    return _committed_probe(sf, "anchor")


def _committed_canaries(parallelism: int) -> list[tuple[str, float]]:
    """Canary history across ALL committed rounds and SFs — the probe
    never touches SF data, so per-SF filtering (ADVICE r11) only thinned
    the baseline for no reason. Rows are comparable ONLY at the same
    partition count: the plan fans out over defaultParallelism, so a
    core-count change silently reshapes it — rows recording a different
    `parallelism` are excluded, and rows predating the field (pre-r12)
    are kept iff the current count matches this host's historical 32."""
    found = []
    for f in _round_bench_files():
        try:
            d = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        d = d.get("parsed") or d
        c = d.get("canary") or {}
        sec = c.get("sec")
        recorded_p = c.get("parallelism", 32 if parallelism == 32 else None)
        if sec and recorded_p == parallelism:
            found.append((f.name, float(sec)))
    return found


# Shuffle-canary shape constants. ~4M rows over defaultParallelism map
# tasks, keyed modulo ~1M so map-side partial aggregation barely reduces
# the stream — the exchange really moves ~4M records across all cores.
# Small enough to run in ~0.3 s idle, parallel enough that the r10
# steal mode (multi-core stages 2-4× slower, serial code untouched)
# cannot hide from it.
_CANARY_ROWS = 4_000_000
_CANARY_KEYS = 1_048_576


def _canary_df(spark):
    """Fixed 2-stage shuffle probe: range scan -> hash exchange -> agg.
    Independent of SF and catalog code; the plan is pinned by the two
    constants above so committed canary times compare across rounds."""
    from pyspark.sql import functions as F

    p = int(spark.sparkContext.defaultParallelism)
    return (
        spark.range(_CANARY_ROWS, numPartitions=p)
        .select((F.col("id") % _CANARY_KEYS).alias("k"), F.col("id"))
        .groupBy("k")
        .agg(F.sum("id").alias("s"), F.count("*").alias("c"))
    )


def _drift(sec: float, committed: list[tuple[str, float]]):
    """(drift-dict, suspect) for a measured probe time vs its committed
    history; (None, False) when no history exists at this SF yet."""
    if not committed:
        return None, False
    newest_name, newest_sec = committed[-1]
    best_name, best_sec = min(committed, key=lambda kv: kv[1])
    drift = {
        "vs_newest": newest_name,
        "newest_sec": newest_sec,
        "factor": round(sec / newest_sec, 2),
        "vs_best": best_name,
        "best_sec": best_sec,
        "factor_vs_best": round(sec / best_sec, 2),
    }
    # flag on the UNROUNDED ratio: a true 1.204 rounds to 1.20 and
    # would otherwise slip under the > 1.2 rule it violates
    return drift, sec / best_sec > 1.2


# pre-JVM 1-minute loadavg at/above this = the host is already busy;
# SCALE.md §18's quiet-host rule. Fires on BENCH_r10's 5.09 with no
# committed history needed.
_LOADAVG_SUSPECT = 1.5
# steal share across the run at/above this = the hypervisor is robbing
# the multi-core stages (see module docstring detector 4 calibration)
_STEAL_SUSPECT_PCT = 3.0


def _proc_stat_snapshot() -> list[int] | None:
    """Aggregate CPU jiffies [user..guest] from /proc/stat (Linux), or
    None where unavailable. Sampled at run start and end to expose
    HYPERVISOR STEAL across the run: while our executors load all
    cores, steal% is the share of demanded cycles the host never got —
    the r11 session measured 10% steal under full load with 0.45% idle
    and a 1-min loadavg of 0.02, i.e. the steal mode that slows 32-way
    stages is INVISIBLE to loadavg but plain in this counter. Suspect
    detector 4 fires at _STEAL_SUSPECT_PCT (see module docstring)."""
    try:
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:10]))
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(pre, post) -> float | None:
    """Steal share (%) of all jiffies elapsed between two snapshots."""
    if not pre or not post:
        return None
    d = [b - a for a, b in zip(pre, post)]
    total = sum(d)
    return round(100.0 * d[7] / total, 2) if total > 0 and len(d) > 7 else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # external-load sample BEFORE the JVM exists: once the run starts our
    # own executor threads dominate loadavg, so only this pre-start sample
    # measures the rest of the host
    loadavg_pre = [round(v, 2) for v in os.getloadavg()]
    cpu_pre = _proc_stat_snapshot()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    headline = {n: s for n, s in cat.items() if s.headline}

    # warm the JVM/codegen path once so timings measure the engine, not init
    next(iter(headline.values())).spark(spark, sf_dir).limit(1).collect()
    # …and the Arrow/Python worker pool: the first pandas_udf in a session
    # pays the per-core python worker spawn (reused afterwards —
    # spark.python.worker.reuse), which is process-start cost, not engine
    # throughput
    from pyspark.sql.functions import col, pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    spark.range(10_000, numPartitions=int(spark.sparkContext.defaultParallelism)).select(
        _ident(col("id"))
    ).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    def best_of(spec, n: int) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    anchor_name = "dedup_exact"
    anchor_spec = cat[anchor_name]

    def time_canary(n: int) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            _canary_df(spark).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    anchor_pre = best_of(anchor_spec, runs)
    canary_pre = time_canary(runs)

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        timings[name] = round(best_of(spec, runs), 3)

    # second anchor/canary window after the loop: min of the two windows
    # discounts a load burst that happened to cover either measurement
    anchor_sec = min(anchor_pre, best_of(anchor_spec, runs), timings.get(anchor_name, float("inf")))
    canary_sec = min(canary_pre, time_canary(runs))
    ratios = {n: round(t / anchor_sec, 2) for n, t in timings.items()}

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    drift, anchor_suspect = _drift(anchor_sec, _committed_anchors(sf_val))
    parallelism = int(spark.sparkContext.defaultParallelism)
    canary_drift, canary_suspect = _drift(canary_sec, _committed_canaries(parallelism))
    steal_run = _steal_pct(cpu_pre, _proc_stat_snapshot())  # timing is done
    reasons = [
        reason
        for flagged, reason in (
            (anchor_suspect, "anchor_drift"),
            (canary_suspect, "canary_drift"),
            (loadavg_pre[0] >= _LOADAVG_SUSPECT, "loadavg_pre_jvm"),
            (steal_run is not None and steal_run >= _STEAL_SUSPECT_PCT, "steal_pct_run"),
        )
        if flagged
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "anchor": {"query": anchor_name, "sec": round(anchor_sec, 3)},
                "canary": {
                    "shape": f"range({_CANARY_ROWS})->exchange(%{_CANARY_KEYS})->agg",
                    "sec": round(canary_sec, 3),
                    # the plan fans out over defaultParallelism; drift
                    # comparison skips committed rows at a different
                    # count (see _committed_canaries)
                    "parallelism": parallelism,
                },
                "ratios": ratios,
                "host": {
                    "loadavg_pre_jvm": loadavg_pre,
                    "cpus": os.cpu_count(),
                    # steal share of ALL cpu jiffies across the run —
                    # our own executors keep the cores demanded, so
                    # nonzero values here are cycles the hypervisor
                    # withheld (see _proc_stat_snapshot docstring)
                    "steal_pct_run": steal_run,
                },
                "anchor_drift": drift,
                "canary_drift": canary_drift,
                # four detectors, ORed (suspect_reasons names the ones
                # that fired): >20% slowdown vs the best committed value
                # on EITHER the single-stage anchor (flags BENCH_r09:
                # 0.242/0.195 = 1.24) or the shuffle canary (the r10
                # steal mode the anchor cannot feel), a pre-JVM 1-min
                # loadavg >= 1.5 (flags BENCH_r10's 5.09 with no
                # history needed), or >=3% /proc/stat steal across the
                # run (no history needed either — the only detector
                # that fired on r11's robbed-but-intermittent window).
                # Absolute totals in a suspect run overstate cost; read
                # the ratios.
                "suspect_reasons": reasons,
                "host_load_suspect": bool(reasons),
                "sf": sf_val,
                "runs_per_query": runs,
                "timing": "min (steady-state; excludes one-time codegen compile); "
                "ratios = query_sec / anchor_sec, host-load-invariant to first order",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
