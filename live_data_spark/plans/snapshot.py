"""SCD2 snapshots — dbt's ``snapshot`` materialization, Spark-native.

The reference declares the capability without exercising it
(dbt_sao/snapshots/.gitkeep — SURVEY.md §1.4 "declare but defer"); this is
the deferred implementation, matching dbt's **timestamp strategy**:

- each run compares the source against the snapshot's open rows by
  ``unique_key``;
- a row whose ``updated_at`` advanced gets its open version closed
  (``valid_to`` set) and a new open version inserted;
- unseen keys insert as new open rows; untouched rows carry forward;
- deletes are ignored (dbt default `invalidate_hard_deletes=false`).

Storage: versioned parquet generations under the snapshot root
(``_v0, _v1, ...``) — each run writes a complete new generation and never
rewrites the one it read, so a crashed run leaves the previous generation
intact (the poor-man's ACID swap; on a real deployment back this with an
ACID table format and a MERGE INTO — same plan shape, one fewer copy).
Scale: the merge is one outer join on unique_key — shuffle both sides on
the key; history grows append-only so generations should be compacted/
partitioned by valid_from date at 100 TB.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VALID_FROM = "dbt_valid_from"
VALID_TO = "dbt_valid_to"

def _open() -> F.Column:
    return F.col(VALID_TO).isNull()


def _latest_generation(root: Path) -> int | None:
    gens = sorted(int(p.name[2:]) for p in root.glob("_v*") if p.name[2:].isdigit())
    return gens[-1] if gens else None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """Current snapshot state (all versions, open + closed), or None."""
    gen = _latest_generation(Path(root))
    if gen is None:
        return None
    return spark.read.parquet(str(Path(root) / f"_v{gen}"))


def snapshot(
    spark: SparkSession,
    source: DataFrame,
    root: str,
    unique_key: str,
    updated_at: str,
) -> DataFrame:
    """Apply one snapshot run; returns the new full SCD2 state.

    Reruns with an unchanged source are no-ops (idempotent): nothing
    closes, nothing inserts, history is stable.
    """
    rootp = Path(root)
    current = read_snapshot(spark, root)

    if current is None:
        new_state = source.withColumn(VALID_FROM, F.col(updated_at)).withColumn(
            VALID_TO, F.lit(None).cast(source.schema[updated_at].dataType)
        )
    else:
        closed = current.where(~_open())
        open_rows = current.where(_open())

        src = source.select(
            *[F.col(c).alias(f"src_{c}") for c in source.columns]
        )
        joined = open_rows.join(
            src, F.col(unique_key) == F.col(f"src_{unique_key}"), "full_outer"
        )

        in_snap = F.col(unique_key).isNotNull()
        in_src = F.col(f"src_{unique_key}").isNotNull()
        changed = in_snap & in_src & (F.col(f"src_{updated_at}") > F.col(updated_at))

        # open rows that stay open: unchanged, or key absent from source
        # (hard deletes ignored, dbt default)
        carried = joined.where(in_snap & ~changed).select(open_rows.columns)
        # open rows superseded by a newer source version: close them at
        # the new version's updated_at (contiguous validity intervals)
        closing = joined.where(changed).select(
            *[F.col(c) for c in source.columns],
            F.col(VALID_FROM),
            F.col(f"src_{updated_at}").alias(VALID_TO),
        )
        # new open versions: changed rows + brand-new keys
        inserts = (
            joined.where(in_src & (~in_snap | changed))
            .select(*[F.col(f"src_{c}").alias(c) for c in source.columns])
            .withColumn(VALID_FROM, F.col(updated_at))
            .withColumn(VALID_TO, F.lit(None).cast(source.schema[updated_at].dataType))
        )
        new_state = closed.unionByName(carried).unionByName(closing).unionByName(inserts)

    gen = (_latest_generation(rootp) or 0) + 1 if _latest_generation(rootp) is not None else 0
    out = rootp / f"_v{gen}"
    new_state.write.mode("overwrite").parquet(str(out))
    return spark.read.parquet(str(out))


def asof_dim_join(
    fact: DataFrame,
    snap: DataFrame,
    key: str,
    fact_ts: str,
    how: str = "left",
) -> DataFrame:
    """Join facts to the dimension VERSION valid at each fact's
    timestamp — the read side of SCD2, completing the snapshot plane
    (write: ``snapshot``; read: this). A fact matches the version whose
    [valid_from, valid_to) interval contains its timestamp; facts
    predating the first version (or with no dim row at all) null-pad
    under the default left join.

    Scale shape: the join is EQUI on ``key`` with the interval predicate
    as a conjunct — Spark plans a hash join keyed on the dim key, never
    a range/nested-loop join, because versions-per-key is small (the
    SCD2 invariant: validity intervals per key are disjoint, so at most
    ONE version row survives the predicate — no fact duplication).
    Shuffle is both sides hashed on the key; at 100 TB bucket the
    snapshot by key and only facts move.
    """
    dim = snap.select(
        F.col(key).alias(f"__dim_{key}"),
        *[F.col(c) for c in snap.columns if c != key],
    )
    cond = (
        (fact[fact_ts] >= dim[VALID_FROM])
        & (dim[VALID_TO].isNull() | (fact[fact_ts] < dim[VALID_TO]))
        & (fact[key] == dim[f"__dim_{key}"])
    )
    return fact.join(dim, cond, how).drop(f"__dim_{key}")
