"""Explicit raw-table schemas — the Snowflake DDL translated to StructTypes.

Reference: airflow/include/scripts/api/mock_schema.py:1-35. Type mapping per
SURVEY.md §1.2: string→StringType, float→DoubleType (Snowflake FLOAT is
64-bit), int→IntegerType, date→DateType, timestamp_ntz→TimestampNTZType
(no session-TZ shifting — Spark ≥3.4 matches NTZ semantics exactly).

Raw loads NEVER infer schemas (SURVEY §1.3): every reader gets one of these.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


CUSTOMERS = _s(
    ("id", StringType()),
    ("first_name", StringType()),
    ("last_name", StringType()),
    ("email", StringType()),
    ("gender", StringType()),  # domain {'F','M','X'} (mock_data.py:48)
    ("city", StringType()),
    ("loaded_at", TimestampNTZType()),
)

PRODUCTS = _s(
    ("id", StringType()),
    ("model", StringType()),
    ("category", StringType()),
    ("subcategory", StringType()),
    ("frame", StringType()),
    ("price", DoubleType()),
    ("product_cost", DoubleType()),
    ("loaded_at", TimestampNTZType()),
)

ORDERS = _s(
    ("id", StringType()),
    ("customer_id", StringType()),
    ("order_date", DateType()),
    ("order_status", StringType()),  # {'shipped','delivered','refunded'} (mock_data.py:63)
    ("loaded_at", TimestampNTZType()),
)

ORDER_PRODUCTS = _s(
    ("id", StringType()),
    ("product_id", StringType()),
    ("order_id", StringType()),
    ("quantity", IntegerType()),
    ("loaded_at", TimestampNTZType()),
)

RAW_SCHEMAS: dict[str, StructType] = {
    "customers": CUSTOMERS,
    "products": PRODUCTS,
    "orders": ORDERS,
    "order_products": ORDER_PRODUCTS,
}

RAW_TABLES = tuple(RAW_SCHEMAS)
