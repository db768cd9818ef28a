"""Focused pins for the r12 optimization-round internals.

Each optimization that changed an operator's internals gets a direct
test of the new code path here, beyond the catalog-wide sweeps that
already cover them (oracle parity, gate-closed arm equality,
plan hygiene):

- ``graph.order_pair_counts`` — the basket-explode pair extraction that
  replaced the DISTINCT + self-join shape.
- ``dedup._components_driver`` — the gate-open union-find arm of
  ``dedup_clusters``.
- ``similarity._rescore_pairs`` — the gate-open broadcast-matrix
  re-score vs the gate-closed join re-score (value equality).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_order_pair_counts_matches_manual_baskets(spark):
    from live_data_spark.operators.graph import order_baskets, order_pair_counts

    li = spark.createDataFrame(
        [
            # order 1: parts {3, 1, 2} (with a duplicate lineitem for 1)
            (1, 3), (1, 1), (1, 2), (1, 1),
            # order 2: parts {2, 3}
            (2, 3), (2, 2),
            # order 3: single-part basket -> no pairs
            (3, 9),
        ],
        "l_orderkey long, l_partkey long",
    )
    got = {
        (r["p1"], r["p2"]): r["n_both"]
        for r in order_pair_counts(order_baskets(li)).collect()
    }
    # per-order distinct pairs, p1 < p2, counted across orders
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_components_driver_union_find_min_labels(spark):
    from live_data_spark.operators.dedup import _components_driver

    # symmetric edge list: path 1-2-3, pair 10-11 (order shuffled so the
    # union-find sees children before parents too)
    pairs = [(2, 3), (10, 11), (1, 2)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "a long, b long"
    )
    got = {r["doc_id"]: r["lbl"] for r in _components_driver(spark, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_driver_empty_edges(spark):
    from live_data_spark.operators.dedup import _components_driver

    edges = spark.createDataFrame([], "a long, b long")
    assert _components_driver(spark, edges).count() == 0


def test_rescore_pairs_arms_identical(spark, sf_dir, monkeypatch):
    """The broadcast-matrix arm and the join arm of _rescore_pairs must
    return identical rows (same float64 ops on the same values)."""
    from live_data_spark import catalog as catmod
    from live_data_spark.catalog import load
    from live_data_spark.operators.similarity import _rescore_pairs, as_double

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    ids = [r["vec_id"] for r in e.select("vec_id").limit(40).collect()]
    cand = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :: 7]],
        "vec_id_1 long, vec_id_2 long",
    )
    open_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, sf_dir, e, cand, 0.2).collect()
    )
    monkeypatch.setattr(catmod, "BROADCAST_GATE_BYTES", -1)
    closed_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, sf_dir, e, cand, 0.2).collect()
    )
    assert open_arm, "planted candidate set produced no scored pairs"
    assert open_arm == closed_arm
