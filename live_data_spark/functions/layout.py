"""Multi-column clustering keys for data-skipping layouts.

``write_sorted_parquet`` (sources/files.py) makes ONE column's min/max
stats selective; real fact tables filter on several (user AND time,
lang AND source). A lexicographic sort only prunes on the leading
column; a Z-ORDER (Morton) key interleaves the columns' bits so files
cover compact hyper-rectangles of the key space and every clustered
column's per-file range tightens at once — the layout trick behind
Delta/Iceberg ``ZORDER BY``, built here from plain Spark bit
expressions (shiftright/bitwiseAND/shiftleft — whole-stage codegen,
no UDF).

Columns must be NON-NEGATIVE INTS fitting ``bits`` bits; callers map
raw values first (hash-bucket strings, epoch-bucket timestamps,
``ntile``/range-bucket skewed ids — any order-preserving bucketing
works, and for pruning only the BUCKET resolution matters). bits ×
n_cols must stay ≤ 63 (signed long key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` into one long: bit b of column i lands
    at position b·n + (n−1−i), so high bits of every column dominate
    together. 2 cols × 16 bits ⇒ a 32-bit key; expression count is
    bits·n plain bit-ops — all codegen'd."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"zorder_key: {bits} bits × {n} cols exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    key = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + (n - 1 - i)
            )
    return key


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, n_files: int | None = None
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key of ``cols``, drop the key, write. Each output file then
    covers a compact box in the multi-column space, so parquet min/max
    stats prune on EVERY clustered column — pinned by the box-query
    skipping test in tests/test_engine.py."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__zkey", zorder_key(cols, bits=bits))
        .repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
