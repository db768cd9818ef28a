#!/usr/bin/env python
"""Driver-style oracle sweep at sf0.1 — the scale twin of preflight.py.

Catches scale-dependent mismatches sf0.01 never trips (ties, thresholds,
windows — the round-3 lesson). Excludes entries whose DUCKDB side is
quadratic/recursive and cannot finish at sf0.1 (their Spark sides are
banded/linear and run fine; they are verified at sf0.01 by preflight and
at scale by their pytest recall/plan pins).

Usage: python scripts/sweep_sf01.py [name-substring]
Exit 0 iff every swept entry is green.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
# tests/test_oracle_parity's shared canonicalizer lives in tests/conftest,
# which pytest puts on sys.path but a plain import does not — mirror that
# here so the sweep runs standalone (broke when the canonicalizer was
# consolidated in round 7 session 4; caught at the round-8 gate).
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from live_data_spark.catalog import catalog  # noqa: E402
from live_data_spark.session import get_spark  # noqa: E402
from tests.test_oracle_parity import duck_connection, normalize  # noqa: E402

SF = "/root/testdata/sf0.1"

# DuckDB-side quadratic / recursive oracles — infeasible at sf0.1
HEAVY = {
    "dedup_ngram_jaccard",
    "dedup_threshold_curve",
    "text_sparse_cosine_topk",  # 31-word testdata vocab → ~12M candidate pairs BOTH engines
    "dedup_containment",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_minhash",
    "dedup_containment_minhash",
    "dedup_incremental_minhash",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "semdedup_pairs",
}


def main() -> int:
    needle = sys.argv[1] if len(sys.argv) > 1 else ""
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duck_connection(SF)
    n = 0
    bad: list[str] = []
    for name, spec in catalog().items():
        if spec.oracle is None or name in HEAVY or needle not in name:
            continue
        n += 1
        t = time.time()
        try:
            sdf = spec.spark(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and len(srows) == len(drows)
                and normalize(srows, sdf.columns) == normalize(drows, dcols)
            )
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            ok = False
            print(f"[{n}] {name}: EXC {type(ex).__name__}: {str(ex)[:120]}", flush=True)
        if not ok:
            bad.append(name)
        print(f"[{n}] {name}: {'ok' if ok else 'RED'} ({time.time() - t:.1f}s)", flush=True)
    print(f"sweep_sf01: {n - len(bad)}/{n} green at {SF}" + (f"; RED={bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
