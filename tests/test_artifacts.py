"""Versioned artifact store: immutability, latest-read, partition pruning,
and a real model round-trip (BPE merges trained → persisted → reloaded →
encoding unchanged)."""

from __future__ import annotations

import pytest

from live_data_spark import artifacts as art


def test_artifact_versioning_and_latest(spark, tmp_path):
    p = str(tmp_path / "model")
    assert art.list_versions(spark, p) == []
    with pytest.raises(FileNotFoundError):
        art.read_artifact(spark, p)

    v1 = spark.createDataFrame([(1, "a")], "rank int, tok string")
    art.write_artifact(v1, p, 1)
    v2 = spark.createDataFrame([(1, "a"), (2, "b")], "rank int, tok string")
    art.write_artifact(v2, p, 2)

    assert art.list_versions(spark, p) == [1, 2]
    assert art.read_artifact(spark, p).count() == 2  # latest = v2
    assert art.read_artifact(spark, p, version=1).count() == 1
    # versions are immutable: same-version write is rejected
    with pytest.raises(ValueError):
        art.write_artifact(v1, p, 2)
    with pytest.raises(ValueError):
        art.read_artifact(spark, p, version=99)
    # version column never leaks to consumers
    assert art.VERSION_COL not in art.read_artifact(spark, p).columns


def test_artifact_read_prunes_partitions(spark, tmp_path):
    p = str(tmp_path / "model")
    for v in (1, 2, 3):
        art.write_artifact(
            spark.createDataFrame([(v,)], "x int"), p, v
        )
    df = art.read_artifact(spark, p, version=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__version" in plan, (
        "version predicate must prune at the scan, not filter post-read"
    )
    assert [r["x"] for r in df.collect()] == [2]


def test_bpe_merges_roundtrip_through_artifact(spark, tmp_path):
    """Train → persist → reload → encode must equal encode-with-in-memory
    ranks: the artifact layer cannot perturb model semantics (ordering
    is carried by the rank column, not row order)."""
    from live_data_spark.operators import tokenizer as tk

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(["low low lower", "newest low"])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    merges = tk.bpe_train(spark, sf, n_merges=6)
    model = spark.createDataFrame(
        [(i, l, r) for i, (l, r, _) in enumerate(merges)],
        "rank int, left string, right string",
    )
    p = str(tmp_path / "bpe_model")
    art.write_artifact(model, p, 1)

    loaded = art.read_artifact(spark, p).orderBy("rank").collect()
    ranks_loaded = {(r["left"], r["right"]): r["rank"] for r in loaded}
    ranks_mem = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    assert ranks_loaded == ranks_mem
    for w in ("low", "lower", "newest", "unseen"):
        assert tk.encode_word(w, ranks_loaded) == tk.encode_word(w, ranks_mem)
