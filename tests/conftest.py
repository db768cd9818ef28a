"""Shared fixtures: one SparkSession per test run, driver testdata paths."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"

def canon_rows(rows, columns):
    """THE order-insensitive canonical row form the driver's value hash
    sees (column-name-sorted tuples, %.10g floats with -0.0 collapsed,
    None sentinel, bools as ints) — one definition shared by every
    result-comparing sweep (oracle parity, partition-layout invariance,
    broadcast-gate-closed) so a float-format or NaN-handling tweak can
    never desynchronize them. scripts/preflight.py carries the same
    logic as a standalone driver replica."""
    import math

    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v + 0.0:.10g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(tuple(canon(row[i]) for i in order) for row in rows)


# Non-catalog hardening helpers (implemented swap-ins documented in
# SCALE.md): the default-deny sweeps (plan hygiene, empty input) can't
# discover them through the catalog, so they enumerate this ONE list —
# append every new swap-in here and both sweeps pick it up together.
NON_CATALOG_HELPERS = [
    ("triangles_degree_oriented", "live_data_spark.operators.graph"),
    ("source_cap_hash_rate", "live_data_spark.operators.curation"),
    ("html_strip_stats_dom", "live_data_spark.operators.text"),
    # neardup_lsh_production_band graduated to the catalog in r11 (the
    # catalog sweeps discover it there); semdedup's production-k twin
    # takes the swap-in slot
    ("semdedup_pairs_production", "live_data_spark.operators.clustering"),
]


@pytest.fixture(scope="session")
def spark():
    from live_data_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="live_data_spark-tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
