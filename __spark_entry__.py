"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``live_data_spark.catalog``: every implemented operator
from SURVEY.md §2 registers itself there as a (Spark query, DuckDB oracle)
pair; this module just re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from live_data_spark.catalog import catalog  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The fact-table build: lineitem ⟕ part (broadcast) ⟕ orders →
    line-item-grain projection (reference fct_order_products.sql:1-33).
    """
    return catalog()["fct_order_lineitems"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in catalog().items() if spec.oracle is not None}
