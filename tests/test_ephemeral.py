"""Ephemeral materialization: dbt's compile-to-CTE node, made literal.

dbt's fourth stock materialization (alongside view/table/incremental —
the reference project uses the stock matrix via dbt_project.yml): an
ephemeral model never becomes a relation; every ref() inlines it into
the consumer. Here ref() returns the composed lazy plan itself, so the
pins are about ABSENCE — no temp view, no warehouse write — and about
the downstream plan inlining the subplan (filter pushed through to the
source scan, no scan of any materialized path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_data_spark.plans import Project


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture()
def eph_project(spark, tmp_path, sf_dir):
    p = Project(spark, warehouse_dir=str(tmp_path / "wh"))
    from live_data_spark.plans import SourceDef

    p.add_source(SourceDef("testdata", "orders", f"{sf_dir}/orders.parquet"))

    @p.model(materialized="ephemeral")
    def big_orders(ctx):
        return ctx.source("testdata", "orders").where(F.col("o_totalprice") > 1000)

    @p.model(materialized="table")
    def big_order_keys(ctx):
        return ctx.ref("big_orders").select("o_orderkey", "o_totalprice")

    return p


def test_ephemeral_is_not_a_relation(eph_project, spark, tmp_path):
    built = eph_project.run()
    # dbt run skips ephemeral nodes; consumers build it implicitly
    assert set(built) == {"big_order_keys"}
    # no temp view, not addressable by name in SQL
    assert "big_orders" not in [t.name for t in spark.catalog.listTables()]
    # no warehouse path written
    assert not list((tmp_path / "wh").rglob("*big_orders*"))


def test_ephemeral_inlines_into_downstream_plan(eph_project, spark):
    df = eph_project.build("big_order_keys")
    # the TABLE consumer materialized (its own barrier), but the plan
    # that produced it must have read the SOURCE directly with the
    # ephemeral model's filter pushed into that scan — rebuild the
    # consumer's pre-write plan via an explicit select of the ephemeral
    sub = eph_project.build("big_orders").select("o_orderkey", "o_totalprice")
    executed = sub._jdf.queryExecution().executedPlan().toString()
    assert "orders.parquet" in executed  # reads the raw source...
    assert "/wh/" not in executed  # ...never a materialized path
    # filter inlined and PUSHED into the parquet scan itself
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,1000" in executed
    assert "Filter" in _optimized(sub)


def test_ephemeral_plan_memoizes_and_composes(eph_project):
    # two refs compose the SAME lazy subplan (dbt: same CTE text twice;
    # Catalyst dedups via exchange/subquery reuse where profitable)
    a = eph_project.build("big_orders")
    b = eph_project.build("big_orders")
    assert a is b


def test_ephemeral_rejects_write_configs(spark, tmp_path):
    p = Project(spark, warehouse_dir=str(tmp_path))
    with pytest.raises(ValueError, match="never write"):

        @p.model(materialized="ephemeral", partition_by=("d",))
        def m1(ctx):  # pragma: no cover - registration fails
            raise AssertionError

    with pytest.raises(ValueError, match="observe"):

        @p.model(materialized="ephemeral", observe={"n": "count(1)"})
        def m2(ctx):  # pragma: no cover - registration fails
            raise AssertionError


def test_ephemeral_values_match_view_twin(spark, tmp_path, sf_dir):
    """Same model body as ephemeral vs view → identical results (the
    materialization is a physical choice, never a semantic one)."""
    from live_data_spark.plans import SourceDef

    results = {}
    for mat in ("ephemeral", "view"):
        p = Project(spark, warehouse_dir=str(tmp_path / mat))
        p.add_source(SourceDef("testdata", "orders", f"{sf_dir}/orders.parquet"))

        @p.model(name="m", materialized=mat)
        def m(ctx):
            return (
                ctx.source("testdata", "orders")
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        results[mat] = sorted(map(tuple, p.build("m").collect()))
        spark.catalog.dropTempView("m") if mat == "view" else None
    assert results["ephemeral"] == results["view"]
