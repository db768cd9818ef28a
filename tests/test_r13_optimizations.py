"""Focused pins for the r13 optimization-round internals.

- ``similarity._rescore_pairs`` gate-open arm: plan BUILD runs no Spark
  job (the r12 shape collected + broadcast the matrix eagerly per
  build); missing candidate ids and NaN (zero-norm) cosines now behave
  identically on both arms.
- ``clustering._merge_profile_partials`` — the in-Spark partial merge
  that bounds the kmeans profile collect at k rows.
- ``curation.dsir_log_weights`` — the empty-array explode guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F


def _write_embeddings(tmp_path, rows):
    """rows: [(vec_id, [floats...])] → <tmp>/embeddings.parquet"""
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_rescore_build_runs_no_spark_job(spark, sf_dir):
    """The gate-open arm must not run a Spark job at plan-BUILD time
    (ADVICE r12: the eager collect sat in the exact hot path the build
    contract forbids a job in — bench builds pay it 5x, plan sweeps
    every entry). Building the plan under a fresh job group must leave
    the group empty."""
    from live_data_spark.catalog import load
    from live_data_spark.operators.similarity import _rescore_pairs, as_double

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    cand = spark.createDataFrame([(0, 1), (1, 2)], "vec_id_1 long, vec_id_2 long")
    sc = spark.sparkContext
    group = "r13-rescore-build-probe"
    sc.setJobGroup(group, "build must be job-free")
    try:
        df = _rescore_pairs(spark, sf_dir, e, cand, 0.0)
        assert sc.statusTracker().getJobIdsForGroup(group) == []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # ...and the plan still executes (the job happens at ACTION time)
    assert df.count() >= 0


def test_rescore_missing_ids_dropped_on_both_arms(spark, sf_dir, monkeypatch):
    """A candidate id absent from the embeddings table must drop out of
    BOTH arms (the closed arm inner-joins it away; the open arm's
    validated searchsorted gather must match — an unvalidated gather
    returns a neighboring row's vector, silently wrong)."""
    from live_data_spark import catalog as catmod
    from live_data_spark.catalog import load
    from live_data_spark.operators.similarity import _rescore_pairs, as_double

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    ids = [r["vec_id"] for r in e.select("vec_id").limit(6).collect()]
    missing_lo, missing_hi = -7, 10**12  # below min and above max of the table
    cand = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[2], missing_hi), (missing_lo, ids[3])],
        "vec_id_1 long, vec_id_2 long",
    )
    open_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, sf_dir, e, cand, -1.0).collect()
    )
    monkeypatch.setattr(catmod, "BROADCAST_GATE_BYTES", -1)
    closed_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, sf_dir, e, cand, -1.0).collect()
    )
    assert open_arm == closed_arm
    scored_ids = {v for row in open_arm for v in (row[0], row[1])}
    assert missing_lo not in scored_ids and missing_hi not in scored_ids
    assert (ids[0], ids[1]) in {(r[0], r[1]) for r in open_arm}


def test_rescore_nan_cosine_dropped_on_both_arms(spark, tmp_path, monkeypatch):
    """ADVICE r12: a zero-norm embedding yields cosine NaN; numpy's
    ``>=`` drops it while bare Spark ``>=`` keeps it (NaN sorts above
    every double). Both arms must now drop the pair, so gate state can
    never change the result."""
    from live_data_spark import catalog as catmod
    from live_data_spark.catalog import load
    from live_data_spark.operators.similarity import _rescore_pairs, as_double

    d = _write_embeddings(
        tmp_path,
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],  # vec 2: zero norm
    )
    e = load(spark, d, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "vec_id_1 long, vec_id_2 long"
    )
    open_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, d, e, cand, 0.1).collect()
    )
    monkeypatch.setattr(catmod, "BROADCAST_GATE_BYTES", -1)
    closed_arm = sorted(
        tuple(r) for r in _rescore_pairs(spark, d, e, cand, 0.1).collect()
    )
    assert open_arm == closed_arm
    assert [(r[0], r[1]) for r in open_arm] == [(1, 3)]  # NaN pairs gone


def test_merge_profile_partials_unit():
    """The per-cluster applyInPandas merge: element-wise float sums,
    integer count sum, one row out."""
    from live_data_spark.operators.clustering import _merge_profile_partials

    pdf = pd.DataFrame(
        {
            "cluster": [4, 4, 4],
            "vsum": [np.array([1.0, 2.0]), np.array([10.0, 20.0]), np.array([0.5, 0.5])],
            "usum": [np.array([0.1, 0.2]), np.array([0.3, 0.4]), np.array([0.0, 1.0])],
            "n": [3, 5, 1],
        }
    )
    out = _merge_profile_partials(pdf)
    assert list(out["cluster"]) == [4]
    assert out["vsum"].iloc[0] == pytest.approx([11.5, 22.5])
    assert out["usum"].iloc[0] == pytest.approx([0.4, 1.6])
    assert list(out["n"]) == [9]


def test_kmeans_profile_collect_is_k_bounded(spark, sf_dir):
    """The profile partial stream must merge to ≤k rows before any
    collect (guide §5): the merged frame's count is ≤ K_CLUSTERS even
    though the partial pass emits up to k rows per partition."""
    from live_data_spark.operators.clustering import (
        K_CLUSTERS,
        _fit_rounds,
        _merge_profile_partials,
        _profile_partials_fn,
    )
    from live_data_spark.catalog import load
    from live_data_spark.operators.similarity import as_double

    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("emb"))
        .repartition(8)  # force multiple partitions → multiple partials
    )
    centroids = _fit_rounds(e, K_CLUSTERS, 1, None)
    schema = "cluster int, vsum array<double>, usum array<double>, n long"
    partials = e.mapInPandas(_profile_partials_fn(centroids), schema=schema)
    merged = partials.groupBy("cluster").applyInPandas(
        _merge_profile_partials, schema=schema
    )
    assert merged.count() <= K_CLUSTERS
    # and the merge preserves the totals the unmerged stream carries
    tot_merged = merged.agg(F.sum("n")).collect()[0][0]
    tot_raw = partials.agg(F.sum("n")).collect()[0][0]
    assert tot_merged == tot_raw


def test_dsir_log_weights_empty_and_null_text(spark):
    """The explode guard (r13): empty/NULL text must flow through
    dsir_log_weights without touching the sequence(1, 0) edge —
    sequence with a descending stop yields [1, 0] and element_at(w, 0)
    throws. Docs with no grams simply don't appear."""
    from live_data_spark.operators.curation import dsir_log_weights

    d = spark.createDataFrame(
        [(1, "en", "alpha beta"), (2, "en", ""), (3, "de", None)],
        "doc_id long, lang string, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_log_weights(d).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_grams"] == 3  # 2 unigrams + 1 bigram
