"""Skew-mitigation utilities: salted joins for pathological hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions. Salting is the complementary
*plan-level* tool for the case AQE can't fix: a single join key so hot
that even a split partition's build side is one giant hash bucket —
classic in LLM-corpus joins (the empty-string fingerprint, the null user,
the "en" language bucket).

``salted_join``: fact rows get a uniform salt in [0, n_salts); the (small)
dim side is replicated n_salts× with every salt value; the join key
becomes (key, salt) so one hot key spreads over n_salts reducers. Cost:
dim side inflates n_salts× — use only when the dim is broadcast-small or
the skew is measured, and keep n_salts ≈ the skew factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_fact(fact: DataFrame, n_salts: int = 16) -> DataFrame:
    """Uniform deterministic salt per fact row (hash of all columns —
    stable, no rand() so retried tasks salt identically)."""
    return fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int")
    )


def explode_dim(dim: DataFrame, n_salts: int = 16) -> DataFrame:
    """Replicate every dim row once per salt value."""
    return dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


# join types for which salting is equivalence-preserving: every FACT row
# carries exactly one salt, so fact-preserving joins match iff the plain
# join matches. DIM-preserving joins (right/full) are NOT safe: an
# unmatched dim row survives once per replica — n_salts duplicates.
_SALT_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the key salted n_salts ways; result equals the plain
    join (verified in tests/test_skew.py), with the hot key's rows spread
    across n_salts shuffle partitions instead of one.

    Fact-preserving join types only (inner/left/semi/anti): a
    dim-preserving join (right/full) would emit every UNMATCHED dim row
    once per salt replica — n_salts duplicates — so those are rejected
    rather than silently corrupted. To salt a right join, swap the
    sides (salt what you call dim) and use ``how="left"``.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} preserves the replicated dim side — "
            "unmatched dim rows would duplicate n_salts times. Swap the "
            "sides and use a left join."
        )
    keys = [on] if isinstance(on, str) else list(on)
    out = salt_fact(fact, n_salts).join(
        explode_dim(dim, n_salts), [*keys, SALT_COL], how
    )
    return out.drop(SALT_COL)
