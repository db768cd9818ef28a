"""Approximate-aggregate accuracy: HLL distinct within its error band."""

from __future__ import annotations

from live_data_spark.catalog import catalog


def test_approx_distinct_within_band(spark, sf_dir):
    exact = {
        r["event_type"]: r["n_users"]
        for r in catalog()["agg_distinct_users"].spark(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in catalog()["agg_approx_distinct_users"].spark(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        # Spark default relativeSD = 0.05; allow 3 sigma
        assert abs(approx[et] - n) <= max(3, 0.15 * n), (et, n, approx[et])
