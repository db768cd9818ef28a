"""SCD2 snapshot tests: dbt timestamp-strategy semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from live_data_spark.plans.snapshot import VALID_FROM, VALID_TO, read_snapshot, snapshot

T1 = dt.datetime(2026, 1, 1)
T2 = dt.datetime(2026, 2, 1)
T3 = dt.datetime(2026, 3, 1)


def _src(spark, rows):
    return spark.createDataFrame(rows, ["id", "status", "updated_at"])


def test_scd2_full_lifecycle(spark, tmp_path):
    root = str(tmp_path / "snap")

    # run 1: first snapshot — everything open
    s1 = snapshot(spark, _src(spark, [(1, "new", T1), (2, "new", T1)]), root, "id", "updated_at")
    assert s1.count() == 2
    assert s1.where(F.col(VALID_TO).isNull()).count() == 2
    assert {r[VALID_FROM] for r in s1.collect()} == {T1}

    # run 2: id=1 updated, id=2 unchanged, id=3 appears
    s2 = snapshot(
        spark,
        _src(spark, [(1, "shipped", T2), (2, "new", T1), (3, "new", T2)]),
        root,
        "id",
        "updated_at",
    )
    rows = {(r["id"], r["status"], r[VALID_FROM], r[VALID_TO]) for r in s2.collect()}
    assert rows == {
        (1, "new", T1, T2),       # closed at supersession instant
        (1, "shipped", T2, None),  # new open version
        (2, "new", T1, None),      # carried unchanged
        (3, "new", T2, None),      # fresh insert
    }

    # run 3: id=2 deleted from source (ignored), id=1 updated again
    s3 = snapshot(
        spark, _src(spark, [(1, "delivered", T3), (3, "new", T2)]), root, "id", "updated_at"
    )
    open_now = {(r["id"], r["status"]) for r in s3.where(F.col(VALID_TO).isNull()).collect()}
    assert open_now == {(1, "delivered"), (2, "new"), (3, "new")}
    # id=1 history: two closed + one open, contiguous intervals
    h1 = sorted(
        [(r[VALID_FROM], r[VALID_TO]) for r in s3.where(F.col("id") == 1).collect()]
    )
    assert h1 == [(T1, T2), (T2, T3), (T3, None)]


def test_snapshot_idempotent_rerun(spark, tmp_path):
    root = str(tmp_path / "snap")
    src = _src(spark, [(1, "new", T1), (2, "new", T1)])
    snapshot(spark, src, root, "id", "updated_at")
    again = snapshot(spark, src, root, "id", "updated_at")
    assert again.count() == 2
    assert again.where(F.col(VALID_TO).isNotNull()).count() == 0


def test_generations_survive(spark, tmp_path):
    """Each run writes a new generation; the previous one stays readable
    (crash-safety: a failed run never corrupts what it read)."""
    root = tmp_path / "snap"
    snapshot(spark, _src(spark, [(1, "a", T1)]), str(root), "id", "updated_at")
    snapshot(spark, _src(spark, [(1, "b", T2)]), str(root), "id", "updated_at")
    gens = sorted(p.name for p in root.glob("_v*"))
    assert gens == ["_v0", "_v1"]
    assert spark.read.parquet(str(root / "_v0")).count() == 1
    assert read_snapshot(spark, str(root)).count() == 2


def test_empty_root_reads_none(spark, tmp_path):
    assert read_snapshot(spark, str(tmp_path / "nope")) is None


def test_asof_dim_join_picks_version_valid_at_fact_time(spark, tmp_path):
    """Facts join the SCD2 version whose validity interval contains the
    fact timestamp: pre-history facts null-pad, mid-history facts get
    the closed version, current facts the open one, and no fact ever
    duplicates (disjoint intervals ⇒ ≤1 matching version)."""
    from live_data_spark.plans.snapshot import asof_dim_join, snapshot

    root = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, "bronze", "2024-01-01 00:00:00")], "cust_id long, tier string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    snapshot(spark, v1, root, "cust_id", "updated_at")
    v2 = spark.createDataFrame(
        [(1, "gold", "2024-03-01 00:00:00")], "cust_id long, tier string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    state = snapshot(spark, v2, root, "cust_id", "updated_at")

    facts = spark.createDataFrame(
        [
            (100, 1, "2023-12-25 12:00:00"),  # before any version
            (101, 1, "2024-02-01 12:00:00"),  # bronze era
            (102, 1, "2024-03-01 00:00:00"),  # boundary: gold starts (half-open)
            (103, 1, "2024-06-01 12:00:00"),  # open gold version
            (104, 2, "2024-06-01 12:00:00"),  # unknown key
        ],
        "order_id long, cust_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    out = asof_dim_join(facts, state, "cust_id", "ts")
    rows = {r["order_id"]: r for r in out.collect()}
    assert len(rows) == 5, "no fact may duplicate or drop"
    assert rows[100]["tier"] is None
    assert rows[101]["tier"] == "bronze"
    assert rows[102]["tier"] == "gold"  # valid_to is exclusive
    assert rows[103]["tier"] == "gold"
    assert rows[104]["tier"] is None
    # plan sanity: equi hash join on the key, not a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_invalidate_hard_deletes_closes_absent_keys(spark):
    """dbt `invalidate_hard_deletes=True`: a key absent from the source
    closes its open version at the run timestamp (default carries it) —
    both strategies; the closed row keeps its old values."""
    from live_data_spark.plans.snapshot import (
        initial_state,
        initial_state_check,
        snapshot_merge,
        snapshot_merge_check,
    )

    b1 = _src(spark, [(1, "new", T1), (2, "new", T1)])
    b2 = _src(spark, [(1, "shipped", T2)])  # id=2 hard-deleted

    # timestamp strategy
    out = snapshot_merge(
        initial_state(b1, "updated_at"), b2, "id", "updated_at",
        invalidate_hard_deletes=True, delete_asof=T2,
    )
    rows = {(r["id"], r["status"], r[VALID_FROM], r[VALID_TO]) for r in out.collect()}
    assert rows == {
        (1, "new", T1, T2),
        (1, "shipped", T2, None),
        (2, "new", T1, T2),  # closed at the run timestamp, not carried
    }

    # check strategy (and default carry for contrast)
    out_c = snapshot_merge_check(
        initial_state_check(b1.drop("updated_at"), T1, "timestamp"),
        b2.drop("updated_at"), "id", ["status"], T2, "timestamp",
        invalidate_hard_deletes=True,
    )
    rows_c = {(r["id"], r["status"], r[VALID_TO]) for r in out_c.collect()}
    assert (2, "new", T2) in rows_c
    carried = snapshot_merge_check(
        initial_state_check(b1.drop("updated_at"), T1, "timestamp"),
        b2.drop("updated_at"), "id", ["status"], T2, "timestamp",
    )
    assert (2, "new", None) in {
        (r["id"], r["status"], r[VALID_TO]) for r in carried.collect()
    }


def test_check_cols_all_compares_every_nonkey_column(spark):
    """check_cols='all' (dbt shorthand): any non-key column difference
    versions the row — including one outside an explicit subset."""
    from live_data_spark.plans.snapshot import initial_state_check, snapshot_merge_check

    b1 = spark.createDataFrame([(1, "a", "x"), (2, "a", "x")], ["id", "v", "w"])
    b2 = spark.createDataFrame([(1, "a", "y"), (2, "a", "x")], ["id", "v", "w"])
    out = snapshot_merge_check(
        initial_state_check(b1, T1, "timestamp"), b2, "id", "all", T2, "timestamp"
    )
    rows = {(r["id"], r["w"], r[VALID_TO]) for r in out.collect()}
    # id=1 versioned on the w change; id=2 carried
    assert rows == {(1, "x", T2), (1, "y", None), (2, "x", None)}


def test_snapshot_check_storage_walk(spark, tmp_path):
    """snapshot_check: the generation-storage walk under the check
    strategy — first run opens at the run's asof, a compared-column
    change versions, an identical rerun is a no-op, generations
    survive on disk."""
    from live_data_spark.plans.snapshot import snapshot_check

    root = str(tmp_path / "snap_check")
    b1 = spark.createDataFrame([(1, "new"), (2, "new")], ["id", "status"])
    s1 = snapshot_check(spark, b1, root, "id", ["status"], T1, "timestamp")
    assert {(r["id"], r[VALID_FROM], r[VALID_TO]) for r in s1.collect()} == {
        (1, T1, None),
        (2, T1, None),
    }

    b2 = spark.createDataFrame([(1, "shipped"), (2, "new")], ["id", "status"])
    s2 = snapshot_check(spark, b2, root, "id", ["status"], T2, "timestamp")
    assert {(r["id"], r["status"], r[VALID_FROM], r[VALID_TO]) for r in s2.collect()} == {
        (1, "new", T1, T2),
        (1, "shipped", T2, None),
        (2, "new", T1, None),
    }

    again = snapshot_check(spark, b2, root, "id", ["status"], T3, "timestamp")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, s2.collect()))
    # three generations on disk (counted as directories, not rows —
    # the latest state ALSO having 3 rows is coincidental), earlier
    # generations untouched, no leftover temp dirs from the atomic swap
    gens = sorted(p.name for p in (tmp_path / "snap_check").glob("_v*"))
    assert gens == ["_v0", "_v1", "_v2"]
    assert read_snapshot(spark, root).count() == 3
    assert {(r["id"], r[VALID_TO]) for r in spark.read.parquet(f"{root}/_v0").collect()} == {
        (1, None),
        (2, None),
    }


def test_crashed_generation_write_is_ignored_and_healed(spark, tmp_path):
    """A crash DURING a generation write (partial _v{n}, no _SUCCESS; or
    an abandoned .__tmp dir) must neither be selected as state nor block
    the next run — the previous generation stays the ACID-swap truth and
    the next write replaces the debris (ADVICE r9 medium)."""
    from pathlib import Path

    from live_data_spark.plans.snapshot import _latest_generation

    root = tmp_path / "snap_crash"
    s1 = snapshot(spark, _src(spark, [(1, "new", T1)]), str(root), "id", "updated_at")
    assert s1.count() == 1

    # plant both crash artifacts: a partial _v1 (files but no _SUCCESS)
    # and an in-flight temp dir from an interrupted atomic swap
    partial = root / "_v1"
    partial.mkdir()
    (partial / "part-00000.parquet").write_bytes(b"\x00corrupt")
    (root / "_v1.__tmp").mkdir()

    # reads resolve to the committed generation, not the debris
    assert _latest_generation(Path(root)) == 0
    assert read_snapshot(spark, str(root)).count() == 1

    # the replayed run merges against the intact _v0 and REPLACES the
    # partial _v1 with a committed one
    s2 = snapshot(
        spark, _src(spark, [(1, "shipped", T2)]), str(root), "id", "updated_at"
    )
    assert {(r["id"], r["status"], r[VALID_TO]) for r in s2.collect()} == {
        (1, "new", T2),
        (1, "shipped", None),
    }
    assert _latest_generation(Path(root)) == 1
    assert (root / "_v1" / "_SUCCESS").exists()
    assert not (root / "_v1.__tmp").exists()


def test_generations_commit_without_hadoop_success_marker(spark, tmp_path):
    """The _SUCCESS gate must be self-sufficient: some committers never
    write the marker (marksuccessfuljobs=false), and if the gate relied
    on it, every committed generation would read as uncommitted — and
    the next write's debris-clearing rmtree would destroy the real
    history. _write_generation plants the sentinel itself."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prev = hconf.get(key)
    hconf.set(key, "false")
    try:
        root = tmp_path / "snap_nomarker"
        snapshot(spark, _src(spark, [(1, "new", T1)]), str(root), "id", "updated_at")
        assert (root / "_v0" / "_SUCCESS").exists()
        s2 = snapshot(
            spark, _src(spark, [(1, "shipped", T2)]), str(root), "id", "updated_at"
        )
        # history intact: the second write merged against _v0, not a wipe
        assert {(r["id"], r["status"], r[VALID_TO]) for r in s2.collect()} == {
            (1, "new", T2),
            (1, "shipped", None),
        }
        assert (root / "_v1" / "_SUCCESS").exists()
    finally:
        if prev is None:
            hconf.unset(key)
        else:
            hconf.set(key, prev)
