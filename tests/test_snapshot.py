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
