"""Snowflake → Spark dialect translations.

The reference's SQL is Snowflake dialect; these helpers give each
Snowflake-specific construct a Spark-native equivalent with identical
semantics (SURVEY.md §2.3, §4). All JVM-side Column expressions — no Python
UDFs — so they stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode(col: Column | str, *pairs, default=None) -> Column:
    """Snowflake ``decode(expr, s1, r1, s2, r2, ..., [default])``.

    Multi-way value map; unmatched → ``default`` (NULL when omitted).
    Reference call site: stg_bike_shop__customers.sql:16-19
    (``decode(gender,'F','Female','M','Male','X','Non-binary')``).

    NOTE: PySpark's built-in ``F.decode`` is a *charset* decoder — an
    entirely different function. This compiles to a chained
    ``CASE WHEN`` which Catalyst constant-folds and codegens.

    Snowflake quirk preserved: ``decode(x, NULL, r)`` matches NULLs
    (NULL-safe equality), unlike a plain CASE — we use ``eqNullSafe``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if len(pairs) % 2 == 1:
        *pairs, default = pairs
    if not pairs:
        return F.lit(default)
    expr = None
    for search, result in zip(pairs[0::2], pairs[1::2]):
        cond = c.eqNullSafe(F.lit(search))
        expr = F.when(cond, F.lit(result)) if expr is None else expr.when(cond, F.lit(result))
    return expr.otherwise(F.lit(default))


def dec2(col: Column | str) -> Column:
    """Cast a money-like column to exact decimal(18,2).

    Engine-parity rule: float ``round()``/``sum()`` are engine-divergent
    (Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    binary value; float sums are order-dependent). Doing monetary
    arithmetic in decimal makes every intermediate exact and identical
    on any engine; cast to double only at the output boundary.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def money_sum(col: Column | str) -> Column:
    """Order-independent exact sum of a 2-dp money column → double."""
    return F.sum(dec2(col)).cast("double")


def exclude(df: DataFrame, *cols: str) -> DataFrame:
    """Snowflake ``SELECT * EXCLUDE (a, b, ...)`` (dim_customer.sql:5,
    dim_order.sql:5, dim_product.sql:5).

    Vanilla Spark SQL has no EXCLUDE; ``DataFrame.drop`` is the exact
    equivalent and Catalyst prunes the dropped columns all the way down
    to the scan (``ReadSchema`` shrinks — verified in tests).
    """
    return df.drop(*cols)


def deterministic_sample(df: DataFrame, key: Column | str, pct: int, buckets: int = 100) -> DataFrame:
    """Deterministic analog of Snowflake ``SAMPLE (pct)`` (sample_table.sql:3).

    Snowflake's row-wise Bernoulli sample is nondeterministic; for
    oracle-comparable results we hash-partition the key space instead:
    keep rows where a multiplicative hash of ``key`` lands in the first
    ``pct`` of ``buckets``. Statistically uniform for integer keys and
    reproducible on any engine (pure arithmetic — no engine-specific
    hash). For true Bernoulli semantics use ``df.sample(pct/100)``.
    """
    c = F.col(key) if isinstance(key, str) else key
    # Knuth multiplicative hash, folded into [0, buckets). The % 100003
    # (prime) pre-reduction keeps the product inside 64 bits for ANY key
    # magnitude — without it, keys ≥ ~3.5e9 would overflow bigint and the
    # bucket would silently diverge from the oracle's arithmetic at scale.
    h = F.pmod(F.pmod(c.cast("bigint"), F.lit(100003)) * F.lit(2654435761), F.lit(buckets))
    return df.where(h < F.lit(pct))


def weighted_choice(rand_col: Column, choices: Sequence, weights: Sequence[float]) -> Column:
    """Weighted categorical pick from a uniform [0,1) column.

    Spark-native version of the generator's ``random.choices(..., weights=...)``
    (mock_data.py:63,94,102,104): bucket a single ``F.rand()`` draw on the
    cumulative weight distribution with a CASE chain — fully vectorized,
    no Python loop.
    """
    total = float(sum(weights))
    cum = 0.0
    expr = None
    for choice, w in zip(choices, weights):
        cum += w / total
        cond = rand_col < F.lit(cum)
        expr = F.when(cond, F.lit(choice)) if expr is None else expr.when(cond, F.lit(choice))
    return expr.otherwise(F.lit(choices[-1]))


def gaussian_pdf(col: Column | str, mean: Column, std: Column) -> Column:
    """Closed-form Gaussian pdf, replacing the reference's per-row
    ``scipy.stats.norm.pdf`` Python UDF (mock_data.py:70-83).

    exp(-(x-μ)²/(2σ²)) / (σ·√(2π)) as a native expression: stays in
    whole-stage codegen instead of ~100x-slower row-at-a-time Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(-F.pow(c - mean, 2) / (2 * std * std)) / (std * F.lit(math.sqrt(2 * math.pi)))
