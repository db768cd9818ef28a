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

from live_data_spark.catalog import load, register

VALID_FROM = "dbt_valid_from"
VALID_TO = "dbt_valid_to"

def _open() -> F.Column:
    return F.col(VALID_TO).isNull()


def _latest_generation(root: Path) -> int | None:
    """Newest COMMITTED generation. Only directories whose write finished
    (Spark's ``_SUCCESS`` job-commit marker) count: a crash DURING a
    generation write must leave the previous generation selected — a
    name-only probe would pick the partial ``_v{n}`` and silently orphan
    the real history (the 'previous generation intact' ACID-swap
    contract; crash-replay then merges against corrupt state). The
    in-flight temp dirs (``_v{n}.__tmp``) fail the isdigit gate too."""
    gens = sorted(
        int(p.name[2:])
        for p in root.glob("_v*")
        if p.name[2:].isdigit() and (p / "_SUCCESS").exists()
    )
    return gens[-1] if gens else None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """Current snapshot state (all versions, open + closed), or None."""
    gen = _latest_generation(Path(root))
    if gen is None:
        return None
    return spark.read.parquet(str(Path(root) / f"_v{gen}"))


def initial_state(source: DataFrame, updated_at: str) -> DataFrame:
    """The SCD2 state a first snapshot run materializes: every source row
    opens a version at its own ``updated_at``."""
    return source.withColumn(VALID_FROM, F.col(updated_at)).withColumn(
        VALID_TO, F.lit(None).cast(source.schema[updated_at].dataType)
    )


def _scd2_merge(
    current: DataFrame,
    source: DataFrame,
    unique_key: str,
    changed_core: F.Column,
    new_version_ts: F.Column,
    vt_type,
    delete_ts: F.Column | None = None,
) -> DataFrame:
    """The strategy-independent SCD2 merge skeleton shared by dbt's two
    stock strategies (``timestamp``: snapshot_merge; ``check``:
    snapshot_merge_check). ``changed_core`` is the strategy's change
    predicate over the full-outer join (source columns ``src_``-prefixed);
    ``new_version_ts`` is the timestamp (a Column over the join) that
    closes the superseded version AND opens its replacement — the source
    row's ``updated_at`` for the timestamp strategy, the run's ``asof``
    literal for check. ``delete_ts`` (dbt `invalidate_hard_deletes=True`)
    closes the open version of a key ABSENT from the source at that
    timestamp instead of carrying it; None (dbt's default) carries.

    Scale shape: ONE full-outer equi-join on ``unique_key`` between the
    open rows and the source (closed history unions through untouched),
    and each output arm is a selection over that join — no window, no
    per-key ordering; both sides shuffle once on the key.
    """
    source_cols = list(source.columns)
    closed = current.where(~_open())
    open_rows = current.where(_open())

    src = source.select(*[F.col(c).alias(f"src_{c}") for c in source_cols])
    joined = open_rows.join(
        src, F.col(unique_key) == F.col(f"src_{unique_key}"), "full_outer"
    )

    in_snap = F.col(unique_key).isNotNull()
    in_src = F.col(f"src_{unique_key}").isNotNull()
    changed = in_snap & in_src & changed_core
    deleted = in_snap & ~in_src

    # open rows that stay open: unchanged (plus, under dbt's default
    # carry-deletes posture, keys absent from the source)
    carry_pred = in_snap & ~changed if delete_ts is None else in_snap & in_src & ~changed
    carried = joined.where(carry_pred).select(open_rows.columns)
    # open rows superseded by a newer source version: close them at the
    # new version's timestamp (contiguous validity intervals); the
    # closed version keeps the OLD attribute values. Hard-deleted keys
    # close at delete_ts when invalidation is on.
    close_pred = changed if delete_ts is None else changed | deleted
    close_at = (
        new_version_ts
        if delete_ts is None
        else F.when(changed, new_version_ts).otherwise(delete_ts)
    )
    closing = joined.where(close_pred).select(
        *[F.col(c) for c in source_cols],
        F.col(VALID_FROM),
        close_at.alias(VALID_TO),
    )
    # new open versions: changed rows + brand-new keys
    inserts = joined.where(in_src & (~in_snap | changed)).select(
        *[F.col(f"src_{c}").alias(c) for c in source_cols],
        new_version_ts.alias(VALID_FROM),
        F.lit(None).cast(vt_type).alias(VALID_TO),
    )
    return closed.unionByName(carried).unionByName(closing).unionByName(inserts)


def snapshot_merge(
    current: DataFrame,
    source: DataFrame,
    unique_key: str,
    updated_at: str,
    invalidate_hard_deletes: bool = False,
    delete_asof=None,
) -> DataFrame:
    """One SCD2 merge under dbt's **timestamp strategy**, as a pure plan:
    (current state, new source) → new state. ``snapshot`` wraps this with
    the generation storage walk; the catalog entry ``snapshot_scd2_orders``
    runs it bare so the driver's oracle can check the merge end-to-end.

    NULL-safe "source version advanced": a NULL updated_at comparison
    yields SQL NULL, which would fail the carried filter (in_snap &
    ~changed) AND the closing/inserts filters — both the open version
    and the source row silently vanish. Coalesce so a NULL-timestamped
    source row carries the open version forward (no evidence it
    advanced), while a NULL-timestamped OPEN row superseded by a real
    timestamp counts as changed.

    ``invalidate_hard_deletes`` (dbt's config of the same name): close
    the open version of keys ABSENT from the source at ``delete_asof``
    (the run's timestamp — there is no source row to take updated_at
    from) instead of carrying them. Default False = dbt's default carry.
    """
    src_upd, upd = F.col(f"src_{updated_at}"), F.col(updated_at)
    changed_core = F.coalesce(src_upd > upd, upd.isNull() & src_upd.isNotNull())
    dts = None
    if invalidate_hard_deletes:
        if delete_asof is None:
            raise ValueError(
                "invalidate_hard_deletes needs delete_asof (the run timestamp)"
            )
        vt = source.schema[updated_at].dataType
        dts = (
            delete_asof
            if isinstance(delete_asof, F.Column)
            else F.lit(delete_asof).cast(vt)
        )
    return _scd2_merge(
        current,
        source,
        unique_key,
        changed_core,
        new_version_ts=src_upd,
        vt_type=source.schema[updated_at].dataType,
        delete_ts=dts,
    )


def initial_state_check(source: DataFrame, asof, vt_type="timestamp_ntz") -> DataFrame:
    """First-run SCD2 state under the check strategy: every source row
    opens at the RUN's timestamp (there is no per-row ``updated_at`` to
    anchor on — dbt stamps the run's started_at)."""
    ts = F.lit(asof).cast(vt_type) if not isinstance(asof, F.Column) else asof
    return source.withColumn(VALID_FROM, ts).withColumn(
        VALID_TO, F.lit(None).cast(vt_type)
    )


def snapshot_merge_check(
    current: DataFrame,
    source: DataFrame,
    unique_key: str,
    check_cols,
    asof,
    vt_type="timestamp_ntz",
    invalidate_hard_deletes: bool = False,
) -> DataFrame:
    """One SCD2 merge under dbt's **check strategy** (`strategy: check`,
    `check_cols: [...]`): for sources without a reliable ``updated_at``,
    a matched key is changed iff ANY compared column's value differs —
    NULL-safe (`eqNullSafe`, dbt's column-hash compare treats NULL as a
    comparable value), so NULL→value, value→NULL and value→value' all
    open a new version while NULL→NULL carries. Columns OUTSIDE
    ``check_cols`` never trigger a version; a carried row keeps its OLD
    values for them (the snapshot only advances when a compared column
    moves — dbt's documented semantics).

    ``asof`` is the run's snapshot timestamp (dbt uses the run's
    started_at; passing it in keeps the merge a pure deterministic plan):
    it closes superseded versions and opens their replacements and
    brand-new keys. Same single full-outer-join shape as the timestamp
    strategy (see ``_scd2_merge``). ``check_cols="all"`` (dbt's
    shorthand) compares every non-key source column;
    ``invalidate_hard_deletes`` closes source-absent keys at ``asof``.
    """
    if check_cols == "all":
        check_cols = [c for c in source.columns if c != unique_key]
    if not check_cols:
        raise ValueError("check strategy needs at least one compared column")
    ts = F.lit(asof).cast(vt_type) if not isinstance(asof, F.Column) else asof
    changed_core = None
    for c in check_cols:
        diff = ~F.col(c).eqNullSafe(F.col(f"src_{c}"))
        changed_core = diff if changed_core is None else (changed_core | diff)
    return _scd2_merge(
        current,
        source,
        unique_key,
        changed_core,
        new_version_ts=ts,
        vt_type=vt_type,
        delete_ts=ts if invalidate_hard_deletes else None,
    )


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
    current = read_snapshot(spark, root)
    if current is None:
        new_state = initial_state(source, updated_at)
    else:
        new_state = snapshot_merge(current, source, unique_key, updated_at)
    return _write_generation(spark, Path(root), new_state)


def snapshot_check(
    spark: SparkSession,
    source: DataFrame,
    root: str,
    unique_key: str,
    check_cols,
    asof,
    vt_type="timestamp_ntz",
    invalidate_hard_deletes: bool = False,
) -> DataFrame:
    """The generation-storage walk for dbt's **check** strategy — the
    storage twin of ``snapshot`` (dbt's one materialization dispatches on
    its ``strategy`` config; here each strategy keeps its own natural
    signature). ``asof`` is the run's timestamp: it stamps the first
    generation's open rows and every later run's closes/opens. Same
    versioned-parquet generations, same idempotent-rerun property
    (an unchanged source under unchanged check_cols closes nothing)."""
    current = read_snapshot(spark, root)
    if current is None:
        new_state = initial_state_check(source, asof, vt_type)
    else:
        new_state = snapshot_merge_check(
            current,
            source,
            unique_key,
            check_cols,
            asof,
            vt_type,
            invalidate_hard_deletes=invalidate_hard_deletes,
        )
    return _write_generation(spark, Path(root), new_state)


def _write_generation(spark: SparkSession, rootp: Path, new_state: DataFrame) -> DataFrame:
    """Write the next generation crash-safely: to a temp dir first, then
    ONE atomic rename — a reader (or a crash-replayed batch) can never
    observe a half-written ``_v{n}``. ``_latest_generation``'s _SUCCESS
    gate is the second line of defense (pre-fix partial dirs, non-POSIX
    rename). Serves both the batch walk (``snapshot``/``snapshot_check``)
    and the streaming twin (streaming/jobs.py::snapshot_scd2_stream)."""
    import os
    import shutil

    prev = _latest_generation(rootp)
    n = 0 if prev is None else prev + 1
    out, tmp = rootp / f"_v{n}", rootp / f"_v{n}.__tmp"
    # clear leftovers from a crashed prior attempt: an existing _v{n}
    # here is by definition UNCOMMITTED (a committed one would be prev —
    # an invariant this function itself guarantees by always planting the
    # sentinel below, independent of the Hadoop committer's marker)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    new_state.write.mode("overwrite").parquet(str(tmp))
    # plant _SUCCESS ourselves: the Hadoop committer only writes it when
    # mapreduce.fileoutputcommitter.marksuccessfuljobs is on (off under
    # some cloud committers). Without this, every committed generation
    # would fail _latest_generation's gate and the next write's rmtree
    # would destroy the real history. touch() is idempotent when the
    # committer already wrote the marker.
    (tmp / "_SUCCESS").touch()
    os.rename(tmp, out)
    return spark.read.parquet(str(out))


_SCD2_ORACLE = """
WITH b1 AS (
  SELECT o_orderkey, o_orderstatus AS status, o_orderdate AS updated_at
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
)
-- closed first version of keys the second batch updated
SELECT o_orderkey, status, updated_at,
       updated_at AS dbt_valid_from,
       updated_at + INTERVAL 400 DAY AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 = 0
UNION ALL
-- their new open 'U' version
SELECT o_orderkey, 'U' AS status,
       updated_at + INTERVAL 400 DAY AS updated_at,
       updated_at + INTERVAL 400 DAY AS dbt_valid_from,
       CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 = 0
UNION ALL
-- unchanged keys AND hard-deleted keys both carry forward open
SELECT o_orderkey, status, updated_at,
       updated_at AS dbt_valid_from, CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 != 0
UNION ALL
-- keys first seen in the second batch insert open
SELECT o_orderkey, o_orderstatus AS status, o_orderdate AS updated_at,
       o_orderdate AS dbt_valid_from, CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
"""


@register("snapshot_scd2_orders", oracle=_SCD2_ORACLE, tags=("plans", "scd2"))
def snapshot_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SCD2 snapshot runs over a deterministic orders change-stream —
    the catalog-visible parity entry for the snapshot plane (reference
    declares the capability at dbt_sao/snapshots/.gitkeep; write path
    pytest-covered in tests/test_snapshot.py).

    Batch 1 is orders before 1998; batch 2 updates every key ≡ 0 (mod 3)
    (status → 'U', updated_at +400 days), hard-deletes keys ≡ 1 (mod 7)
    among the rest, carries the remainder unchanged, and inserts the
    post-1998 orders — so the merge exercises all four arms (close+insert,
    carry, ignore-delete, new-key insert). The oracle states the expected
    SCD2 state in closed form rather than replaying the merge machinery.
    Runs ``snapshot_merge`` bare (no generation storage), so the whole
    entry is one lazy plan: a full-outer equi-join on o_orderkey plus
    unions — the sweeps see the real join shape.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    b1 = o.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("updated_at"),
    )
    k3 = F.pmod(F.col("o_orderkey"), F.lit(3)) == 0
    k7 = F.pmod(F.col("o_orderkey"), F.lit(7)) == 1
    day400 = F.expr("INTERVAL 400 DAYS")
    b2 = (
        b1.where(k3).select(
            "o_orderkey",
            F.lit("U").alias("status"),
            (F.col("updated_at") + day400).alias("updated_at"),
        )
        .unionByName(b1.where(~k3 & ~k7))
        .unionByName(
            o.where(F.col("o_orderdate") >= cutoff).select(
                "o_orderkey",
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderdate").alias("updated_at"),
            )
        )
    )
    return snapshot_merge(
        initial_state(b1, "updated_at"), b2, "o_orderkey", "updated_at"
    )


_SCD2_CHECK_ORACLE = """
WITH b1 AS (
  SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS note
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
)
-- closed first version of keys whose COMPARED column (status) changed
SELECT o_orderkey, status, note,
       TIMESTAMP '1998-01-01 00:00:00' AS dbt_valid_from,
       TIMESTAMP '1998-07-01 00:00:00' AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 = 0
UNION ALL
-- their new open 'U' version, stamped with the run's asof
SELECT o_orderkey, 'U' AS status, note,
       TIMESTAMP '1998-07-01 00:00:00' AS dbt_valid_from,
       CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 = 0
UNION ALL
-- everything else carries forward open WITH ITS ORIGINAL VALUES:
-- unchanged keys, hard-deleted keys, AND keys whose only change was in
-- the non-compared note column (check_cols=[status] must ignore it)
SELECT o_orderkey, status, note,
       TIMESTAMP '1998-01-01 00:00:00' AS dbt_valid_from,
       CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM b1 WHERE o_orderkey % 3 != 0
UNION ALL
-- keys first seen in the second batch insert open at the run's asof
SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS note,
       TIMESTAMP '1998-07-01 00:00:00' AS dbt_valid_from,
       CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
"""


@register(
    "snapshot_scd2_check_orders", oracle=_SCD2_CHECK_ORACLE, tags=("plans", "scd2")
)
def snapshot_scd2_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's **check** snapshot strategy over a deterministic orders
    change-stream — the strategy for sources without a reliable
    ``updated_at`` (dbt `strategy: check`, `check_cols: ['status']`),
    completing the snapshot plane against dbt's stock surface (the
    reference declares snapshots without exercising them,
    dbt_sao/snapshots/.gitkeep).

    Batch 1 (run asof 1998-01-01) is orders before 1998 with a compared
    column (status) and a non-compared one (note = o_orderpriority).
    Batch 2 (run asof 1998-07-01) flips status → 'U' for keys ≡ 0 (mod 3)
    — the ONLY arm that versions; rewrites note for keys ≡ 2 (mod 3)
    (must carry with the ORIGINAL note: non-compared columns never
    trigger); hard-deletes keys ≡ 1 (mod 7) of the remainder (carry);
    and inserts the post-1998 orders (open at the run's asof). The
    oracle states the expected state in closed form. Runs
    ``snapshot_merge_check`` bare (no generation storage) — one lazy
    full-outer equi-join on o_orderkey, the sweeps see the real shape.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    b1 = o.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("note"),
    )
    k3 = F.pmod(F.col("o_orderkey"), F.lit(3))
    k7 = F.pmod(F.col("o_orderkey"), F.lit(7)) == 1
    b2 = (
        b1.where(k3 == 0)
        .select("o_orderkey", F.lit("U").alias("status"), "note")
        .unionByName(b1.where((k3 == 1) & ~k7))
        .unionByName(
            b1.where(k3 == 2).select(
                "o_orderkey", "status", F.concat(F.col("note"), F.lit("-X")).alias("note")
            )
        )
        .unionByName(
            o.where(F.col("o_orderdate") >= cutoff).select(
                "o_orderkey",
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("note"),
            )
        )
    )
    return snapshot_merge_check(
        initial_state_check(b1, "1998-01-01 00:00:00"),
        b2,
        "o_orderkey",
        check_cols=["status"],
        asof="1998-07-01 00:00:00",
    )


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


_SCD2_ASOF_ORACLE = f"""
WITH state AS ({_SCD2_ORACLE})
SELECT l.l_orderkey AS o_orderkey, l.l_linenumber, l.l_shipdate,
       s.status, s.dbt_valid_from, s.dbt_valid_to
FROM lineitem l
LEFT JOIN state s
  ON s.o_orderkey = l.l_orderkey
 AND l.l_shipdate >= s.dbt_valid_from
 AND (s.dbt_valid_to IS NULL OR l.l_shipdate < s.dbt_valid_to)
"""


@register("snapshot_scd2_asof_facts", oracle=_SCD2_ASOF_ORACLE, tags=("plans", "scd2"))
def snapshot_scd2_asof_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 READ side, catalog-visible: every lineitem joins the order
    VERSION valid at its ship date — ``asof_dim_join`` over
    ``snapshot_scd2_orders``'s merged state, completing the snapshot
    plane's write→read round trip at driver level.

    The deterministic change-stream makes the match arms non-trivial:
    updated keys' lineitems ship inside the CLOSED first version's
    [valid_from, valid_to) window; unchanged/hard-deleted keys match
    their open version; and the synthetic corpus ships ~47% of lineitems
    BEFORE the order date, so those rows exercise the left join's
    null-pad arm (no version valid yet). The SCD2 disjoint-interval
    invariant guarantees at most one version per fact — no fan-out.

    Plan shape: asof_dim_join's documented equi HASH join on the key
    with the interval predicate as a conjunct — never a range/nested
    loop; both sides shuffle once on o_orderkey (at 100 TB bucket the
    snapshot by key so only facts move).
    """
    fact = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"
    )
    state = snapshot_scd2_orders(spark, sf_dir)
    return asof_dim_join(fact, state, key="o_orderkey", fact_ts="l_shipdate").select(
        "o_orderkey",
        "l_linenumber",
        "l_shipdate",
        "status",
        VALID_FROM,
        VALID_TO,
    )
