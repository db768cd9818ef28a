"""Distributed global ranking: range partition + per-partition offsets.

An unpartitioned ``Window.orderBy(...)`` (row_number / ntile /
percent_rank / cume_dist) collapses the whole frame into ONE task — the
classic single-partition stage that caps rank-family analytics at
whatever fits one executor. This module computes the same exact global
1-based rank fully distributed, in three steps:

1. ``repartitionByRange(P, *sort_cols)`` — Spark samples the sort key and
   assigns contiguous key ranges to partitions, so partition *p*'s rows
   all sort before partition *p+1*'s. (The sort key must be a TOTAL order
   — pass a unique tiebreak column — so ranks don't depend on which side
   of a boundary an equal key lands.)
2. A window partitioned BY ``spark_partition_id()`` ordered by the same
   key — runs in parallel, one task per partition — yields local ranks.
3. A P-row side frame of per-partition counts turns into exclusive prefix
   sums (a window over P rows, trivially small) and broadcast-joins back:
   ``global_rank = partition_offset + local_rank``.

Only the P-row offsets frame is ever single-partition; the data path is a
sampling pass + one shuffle + map-side arithmetic, which survives any
scale the range shuffle itself survives. This is the same structure Spark
uses internally for ``sortByKey``/global sort — re-expressed here because
the SQL window API offers no "rank without coalescing" primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"


def with_global_rank(
    df: DataFrame,
    sort_cols: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add exact global 1-based ``rank_col`` ordered by ``sort_cols``.

    ``sort_cols`` must define a total order (include a unique tiebreak).
    If ``total_col`` is given, also attach the total row count n to every
    row (comes free from the same P-row offsets frame — no extra pass).
    Scale contract: no single-partition stage over the data; the only
    driver-size object is the P-row counts frame.
    """
    parted = (
        df.repartitionByRange(num_partitions, *sort_cols)
        if num_partitions
        else df.repartitionByRange(*sort_cols)
    )
    local = parted.withColumn(_PID, F.spark_partition_id()).withColumn(
        _LOCAL, F.row_number().over(Window.partitionBy(_PID).orderBy(*sort_cols))
    )

    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    w_pid = Window.orderBy(_PID)  # P rows total — single partition is fine HERE
    offsets = counts.select(
        _PID,
        F.coalesce(
            F.sum("__cnt").over(w_pid.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias(_OFFSET),
        F.sum("__cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )

    out = local.join(F.broadcast(offsets), _PID).withColumn(
        rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("bigint")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__total").cast("bigint"))
    return out.drop(_PID, _LOCAL, _OFFSET, "__total")


def ntile_from_rank(rank: Column, n: Column, buckets: int) -> Column:
    """Exact ``ntile(buckets)`` from a gap-free global rank.

    Spark/ANSI ntile semantics: the first ``n % buckets`` tiles hold
    ``n div buckets + 1`` rows, the rest ``n div buckets`` — reproduced in
    closed form so no window function is needed.
    """
    q = (n / buckets).cast("bigint")  # floor: n, buckets positive
    rem = n - q * buckets
    big = rem * (q + 1)  # rows living in the (q+1)-sized leading tiles
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - big) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
