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


def test_bench_cli_contract():
    """bench.py is a driver-facing public surface (the driver records its
    stdout as BENCH_r{N}.json): run it end-to-end as a subprocess at
    sf0.001 (1 run/query via SPARK_GRAFT_BENCH_RUNS) and pin the one-
    JSON-line contract — metric/value/unit/queries/sf keys, every
    headline query present with a positive time."""
    import json
    import os
    import subprocess
    import sys

    from live_data_spark.catalog import catalog

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    out = json.loads(json_lines[0])
    assert out["metric"] == "headline_queries_total_wall"
    assert out["unit"] == "sec" and out["value"] > 0
    assert out["sf"] == 0.001 and out["runs_per_query"] == 1
    headline = {n for n, s in catalog().items() if s.headline}
    assert set(out["queries"]) == headline
    assert all(t > 0 for t in out["queries"].values())
    assert abs(sum(out["queries"].values()) - out["value"]) < 0.01
