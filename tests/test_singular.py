"""Singular (SQL) data tests: dbt's tests/*.sql analog as project nodes.

The reference reserves dbt_sao/tests/ for these and ships it empty
(.gitkeep) — SURVEY.md §0/§5. The engine's SingularTest wraps an
arbitrary violation query (Project -> DataFrame) and runs through the
SAME runner / severity / store_failures path as the generic tests;
these arms pin that shared-path contract plus the declaration API.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_data_spark.plans import Project, singular
from live_data_spark.plans.testing import SingularTest


@pytest.fixture()
def proj(spark, tmp_path):
    p = Project(spark, warehouse_dir=str(tmp_path / "wh"))

    @p.model
    def orders(ctx):
        return ctx.spark.createDataFrame(
            [(1, "2026-01-01", "2026-01-03"), (2, "2026-01-02", "2026-01-02")],
            ["order_id", "order_date", "ship_date"],
        )

    return p


def _shipped_before_ordered(project):
    return project.relation("orders").where(F.col("ship_date") < F.col("order_date"))


def test_singular_passes_on_empty_violations(proj):
    proj.add_test(singular("assert_ships_after_order", "orders", _shipped_before_ordered))
    [res] = proj.run_tests()
    assert res.passed and res.n_violations == 0
    assert res.test_name == "assert_ships_after_order"
    assert res.model == "orders"


def test_singular_fails_with_sample_and_severity(proj):
    def dup_dates(project):
        return (
            project.relation("orders")
            .groupBy("order_date")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 2)  # passes
        )

    def any_row(project):
        return project.relation("orders").select("order_id")

    proj.add_test(singular("assert_none", "orders", any_row, severity="warn"))
    proj.add_test(singular("assert_dup_dates", "orders", dup_dates))
    res = {r.test_name: r for r in proj.run_tests()}
    failed = res["assert_none"]
    # fails with the real violation rows, but warn severity never blocks
    assert not failed.passed and failed.n_violations == 2
    assert {r[0] for r in failed.sample} == {1, 2}
    assert failed.severity == "warn" and not failed.blocking
    assert res["assert_dup_dates"].passed


def test_singular_store_failures_persists_full_set(proj, spark):
    proj.add_test(
        singular("assert_no_rows", "orders", lambda p: p.relation("orders"))
    )
    [res] = proj.run_tests(store_failures=True)
    assert not res.passed and res.failures_path is not None
    stored = spark.read.parquet(res.failures_path)
    assert stored.count() == 2  # the FULL violation set, not the sample


def test_singular_select_by_model(proj):
    proj.add_test(singular("assert_ships_after_order", "orders", _shipped_before_ordered))
    assert len(proj.run_tests(select=["orders"])) == 1
    assert proj.run_tests(select=["other_model"]) == []


def test_singular_without_builder_raises(proj):
    bad = SingularTest("assert_broken", "orders", column="")
    with pytest.raises(ValueError, match="without a query"):
        bad.build(proj)


def test_singular_in_manifest(proj):
    proj.add_test(singular("assert_ships_after_order", "orders", _shipped_before_ordered))
    proj.run()
    tests = {t["name"]: t for t in proj.manifest()["tests"]}
    assert tests["assert_ships_after_order"]["model"] == "orders"
    assert tests["assert_ships_after_order"]["column"] == ""
