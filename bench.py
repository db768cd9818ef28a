#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each headline query is executed end-to-end (materialized via a count over
the result — forces full evaluation including shuffles/joins without
driver-side collect of wide rows). Wall time per query; total is the sum.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from live_data_spark.catalog import catalog  # noqa: E402
from live_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    headline = {n: s for n, s in cat.items() if s.headline}

    # warm the JVM/codegen path once so timings measure the engine, not init
    next(iter(headline.values())).spark(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
