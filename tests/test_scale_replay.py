"""scale_replay construction invariants (sf0.001, no timing).

The replay's honesty rests on the scaled-copy construction: SCALE.md's
linearity tables are only evidence if m× dirs really are m disjoint
structure-preserving images (naive identical copies manufacture m²
candidate pairs; broken FKs silently empty every join). These arms pin
the construction itself; the timing half stays a manual idle-host tool.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sr():
    spec = importlib.util.spec_from_file_location(
        "scale_replay", REPO / "scripts" / "scale_replay.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def scaled_dir(sr, spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("scale_replay")
    out = sr.build_scaled_dir(
        spark, SF, 3, root, {"documents", "embeddings", "events", "lineitem"}
    )
    return Path(out)


def test_row_counts_scale_only_requested_tables(spark, scaled_dir):
    for t, factor in [
        ("documents", 3),
        ("embeddings", 3),
        ("events", 3),
        # lineitem requested -> whole FK unit scales
        ("lineitem", 3),
        ("orders", 3),
        ("part", 3),
        # untouched tables symlink unscaled
        ("customer", 1),
        ("supplier", 1),
    ]:
        base = spark.read.parquet(f"{SF}/{t}.parquet").count()
        got = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        assert got == factor * base, (t, base, got)


def test_tpch_unit_referential_integrity_and_pk_uniqueness(spark, scaled_dir):
    li = spark.read.parquet(f"{scaled_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{scaled_dir}/orders.parquet")
    p = spark.read.parquet(f"{scaled_dir}/part.parquet")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    assert li.join(p, li.l_partkey == p.p_partkey, "left_anti").count() == 0
    assert o.count() == o.select("o_orderkey").distinct().count()
    assert p.count() == p.select("p_partkey").distinct().count()


def test_events_per_user_structure_preserved(spark, scaled_dir):
    """Disjoint user populations per copy, each with the base per-user
    event-depth distribution: m× corpus = m× the sessions, not longer
    ones."""
    ev = spark.read.parquet(f"{scaled_dir}/events.parquet")
    assert ev.count() == ev.select("event_id").distinct().count()
    base_depth = sorted(
        r[0]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
        .select("count")
        .collect()
    )
    scaled_depth = sorted(
        r[0] for r in ev.groupBy("user_id").count().select("count").collect()
    )
    assert scaled_depth == sorted(base_depth * 3)


def test_document_copies_have_disjoint_shingles_but_equal_dup_structure(spark, scaled_dir):
    """Token salting: equal texts stay equal WITHIN a copy (dup clusters
    replicate, not grow) while no whitespace token survives across
    copies (cross-copy shingle sets disjoint)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF}/documents.parquet")
    d = spark.read.parquet(f"{scaled_dir}/documents.parquet")
    # ADVICE r10: the builder shifts copy i by i*(max(id)+1), which only
    # equals i*count when ids are 0-based and dense — slice by the
    # builder's own stride so regenerated gappy/1-based testdata cannot
    # fail these invariants spuriously
    n_base = base.agg(F.max("doc_id")).first()[0] + 1

    # in-copy duplicate structure: the multiset of exact-text group
    # sizes is identical in every copy
    def group_sizes(df):
        return sorted(
            r[0] for r in df.groupBy("text").count().select("count").collect()
        )

    want = group_sizes(base)
    for i in range(3):
        copy_i = d.where(
            (F.col("doc_id") >= i * n_base) & (F.col("doc_id") < (i + 1) * n_base)
        )
        assert group_sizes(copy_i) == want, f"copy {i} dup structure drifted"

    # cross-copy disjointness: zero shared tokens between copy 0 and 1
    def tokens(df):
        return df.select(
            F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
        ).where(F.col("tok") != "")

    shared = (
        tokens(d.where(F.col("doc_id") < n_base))
        .join(
            tokens(d.where((F.col("doc_id") >= n_base) & (F.col("doc_id") < 2 * n_base))),
            "tok",
        )
        .count()
    )
    assert shared == 0


def test_embedding_copies_are_isometric_images(spark, scaled_dir):
    """Rademacher sign flip: norms and in-copy pairwise cosines exactly
    preserved (orthogonal transform), cross-copy cosines decorrelated."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = spark.read.parquet(f"{scaled_dir}/embeddings.parquet")
    # builder stride, not count (see the documents twin above)
    n_base = base.agg(F.max("vec_id")).first()[0] + 1

    def mat(df, lo, hi):
        rows = (
            df.where((df.vec_id >= lo) & (df.vec_id < hi))
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        return np.array([r[0] for r in rows], dtype=np.float64)

    m0 = mat(d, 0, 30)
    m1 = mat(d, n_base, n_base + 30)
    # norms exactly preserved (float32 sign flip is lossless)
    np.testing.assert_array_equal(
        np.linalg.norm(m0, axis=1), np.linalg.norm(m1, axis=1)
    )

    def unit(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    g0, g1 = unit(m0) @ unit(m0).T, unit(m1) @ unit(m1).T
    np.testing.assert_allclose(g0, g1, atol=1e-12)  # in-copy angles identical
    # cross-copy cosines decorrelated: nothing near-duplicate across copies
    cross = unit(m0) @ unit(m1).T
    assert float(np.abs(cross).max()) < 0.9


def test_multiplier_one_is_identity(sr, spark, tmp_path):
    assert sr.build_scaled_dir(spark, SF, 1, tmp_path, {"documents"}) == SF


def _run_main(sr, monkeypatch, capsys, argv):
    monkeypatch.setattr("sys.argv", ["scale_replay.py", *argv])
    rc = sr.main()
    return rc, capsys.readouterr().err


@pytest.mark.parametrize("mults", ["", "1,,3", "x", "3;10"])
def test_malformed_mults_exit_cleanly(sr, monkeypatch, capsys, mults):
    """ADVICE r10: bad --mults tokens take the exit-2 path with a
    message, never an int() traceback."""
    rc, err = _run_main(sr, monkeypatch, capsys, ["dedup_exact", "--mults", mults])
    assert rc == 2
    assert "bad --mults" in err


def test_fuzzy_entry_with_part_scaled_is_refused(sr, monkeypatch, capsys):
    """ADVICE r10: the m² identical-name hazard is enforced — replaying a
    name-similarity entry with part in the scaled set is refused before
    any JVM starts."""
    rc, err = _run_main(
        sr, monkeypatch, capsys,
        ["fuzzy_part_names", "--tables", "part", "--mults", "1,3"],
    )
    assert rc == 2
    assert "fuzzy_part_names" in err and "UNSALTED" in err
    # …and the guard's NEGATIVE path, exercised via the pure predicate
    # (no JVM needed): the same fuzzy entry over a documents-only scaled
    # set is safe (salted copies), while the part FK unit triggers it.
    from live_data_spark.catalog import catalog

    cat = catalog()
    assert "fuzzy" in cat["fuzzy_part_names"].tags
    assert sr.fuzzy_hazard(["fuzzy_part_names"], {"documents"}, cat) == []
    assert sr.fuzzy_hazard(["fuzzy_part_names"], {"part"}, cat) == [
        "fuzzy_part_names"
    ]
    # non-fuzzy entries never trip it, even with part scaled
    assert sr.fuzzy_hazard(["dedup_exact"], {"part", "lineitem"}, cat) == []


def test_gate_closed_flag_is_exposed(sr):
    """r12: entries with a size-gated driver arm (pagerank,
    dedup_clusters, the LSH re-score) still fit the gate at replay
    multipliers, so measuring the DISTRIBUTED arm needs --gate-closed;
    the flag must exist, default off, and document that purpose."""
    src = (REPO / "scripts" / "scale_replay.py").read_text()
    assert '"--gate-closed"' in src
    assert "force_gate_closed()" in src  # main() invokes the patch path
    assert "DISTRIBUTED" in src


def test_gate_closed_patch_really_patches_catalog(sr):
    """ADVICE r12: exercise the actual patch path, not just the flag
    strings — force_gate_closed() must flip the live catalog module
    constant that every size gate reads at call time (a regression that
    parses the flag but patches a stale binding stays green under a
    source grep)."""
    from live_data_spark import catalog as catmod

    before = catmod.BROADCAST_GATE_BYTES
    assert before > 0  # the repo-wide default budget is a real positive gate
    try:
        sr.force_gate_closed()
        assert catmod.BROADCAST_GATE_BYTES == -1
        # the call-time read contract: the shared edge gate sees the patch
        assert catmod.edges_fit_gate(0) is False
        assert catmod.edges_fit_gate(1) is False
    finally:
        catmod.BROADCAST_GATE_BYTES = before
