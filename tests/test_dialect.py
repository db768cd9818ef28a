"""Unit tests for Snowflake→Spark dialect translations (SURVEY.md §7.2).

Edge cases the oracle harness can't isolate: decode NULL-matching,
accepted_values NULL pass-through (covered in test_engine), HALF_UP round
ties, weighted_choice bucket boundaries, gaussian_pdf vs closed form.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from live_data_spark.functions.dialect import (
    dec2,
    decode,
    deterministic_sample,
    exclude,
    gaussian_pdf,
    weighted_choice,
)


def test_decode_basic_and_default(spark):
    df = spark.createDataFrame([("F",), ("M",), ("X",), ("?",), (None,)], ["g"])
    out = df.select(decode("g", "F", "Female", "M", "Male", "X", "Non-binary").alias("v"))
    got = [r["v"] for r in out.collect()]
    assert got == ["Female", "Male", "Non-binary", None, None]


def test_decode_null_safe_match(spark):
    """Snowflake decode(x, NULL, r) matches NULLs — unlike CASE equality."""
    df = spark.createDataFrame([("a",), (None,)], ["v"])
    out = df.select(decode("v", None, "was_null", "a", "was_a").alias("m"))
    assert [r["m"] for r in out.collect()] == ["was_a", "was_null"]


def test_decode_with_default_arg(spark):
    df = spark.createDataFrame([("z",)], ["v"])
    out = df.select(decode("v", "a", "A", default="other").alias("m"))
    assert out.collect()[0]["m"] == "other"
    # odd arg count → trailing value is the default (Snowflake semantics)
    out2 = df.select(decode("v", "a", "A", "fallback").alias("m"))
    assert out2.collect()[0]["m"] == "fallback"


def test_round_half_up_ties(spark):
    """Snowflake/Spark round() is HALF_UP on the decimal repr (F3)."""
    df = spark.createDataFrame([(2.5,), (3.5,), (-2.5,), (2.345,)], ["v"])
    got = [r[0] for r in df.select(F.round("v", 0)).collect()]
    assert got[:3] == [3.0, 4.0, -3.0]  # half away from zero, not banker's
    got2 = df.select(F.round(dec2("v"), 1)).collect()
    # dec2 HALF_UPs to cents on the cast (2.345→2.35), then round(·,1)
    # HALF_UPs again (2.35→2.4) — exact decimal, no float drift
    assert float(got2[3][0]) == 2.4


def test_exclude_drops_and_preserves_order(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    assert exclude(df, "b").columns == ["a", "c"]
    assert exclude(df, "a", "c").columns == ["b"]
    # EXCLUDE of a non-existent column is a no-op in Spark drop (lenient)
    assert exclude(df, "zzz").columns == ["a", "b", "c"]


def test_weighted_choice_distribution(spark):
    df = spark.range(100_000).select(
        weighted_choice(
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0),
            ["a", "b", "c"],
            [5, 2, 1],
        ).alias("pick")
    )
    counts = {r["pick"]: r["count"] for r in df.groupBy("pick").count().collect()}
    n = sum(counts.values())
    assert abs(counts["a"] / n - 5 / 8) < 0.01
    assert abs(counts["b"] / n - 2 / 8) < 0.01
    assert abs(counts["c"] / n - 1 / 8) < 0.01


def test_deterministic_sample_rate_and_stability(spark):
    df = spark.range(100_000)
    s1 = deterministic_sample(df, "id", 5)
    s2 = deterministic_sample(df, "id", 5)
    n = s1.count()
    assert abs(n / 100_000 - 0.05) < 0.005
    assert n == s2.count()  # bit-stable across runs


def test_gaussian_pdf_matches_closed_form(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (-2.5,)], ["x"])
    got = [
        r[0]
        for r in df.select(gaussian_pdf("x", F.lit(0.0), F.lit(1.0)).alias("p")).collect()
    ]
    want = [math.exp(-(x * x) / 2) / math.sqrt(2 * math.pi) for x in (0.0, 1.0, -2.5)]
    assert got == pytest.approx(want, rel=1e-12)


def test_python_udtf_lateral_sentence_split(spark, sf_dir):
    """Spark 4 Python UDTF surface: a table function in a LATERAL join
    (the SQL-native alternative to explode-over-UDF-array when each
    input row fans out to a variable number of STRUCTURED rows).
    Arrow-evaluated (useArrow) — the plan must show ArrowEvalPythonUDTF,
    never the row-pickled path; posture note: for a fan-out expressible
    as split+explode (this one is), the pure-JVM form remains the hot
    path — the UDTF tier exists for stateful/imperative row expansion."""
    from pyspark.sql.functions import udtf

    from live_data_spark.catalog import load

    @udtf(returnType="idx int, n_chars int", useArrow=True)
    class ChunkSpans:
        def eval(self, text: str):
            if not text:
                return
            # imperative chunker: 100-char spans breaking at word ends —
            # the carry-over state is what split+explode can't express
            start = 0
            i = 0
            while start < len(text):
                end = min(start + 100, len(text))
                if end < len(text):
                    sp = text.rfind(" ", start, end)
                    if sp > start:
                        end = sp
                yield i, end - start
                start = end + 1
                i += 1

    spark.udtf.register("chunk_spans", ChunkSpans)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        "SELECT d.doc_id, t.idx, t.n_chars "
        "FROM docs_udtf d, LATERAL chunk_spans(d.text) t"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython" not in plan
    rows = out.collect()
    assert len(rows) > 0
    # spans reconstruct each doc: sum of span lengths + separators ≈ doc len
    import collections

    per_doc = collections.defaultdict(int)
    n_spans = collections.Counter()
    for r in rows:
        per_doc[r["doc_id"]] += r["n_chars"]
        n_spans[r["doc_id"]] += 1
    docs = {r["doc_id"]: len(r["text"]) for r in load(spark, sf_dir, "documents").collect() if r["text"]}
    for did, total in per_doc.items():
        gaps = n_spans[did] - 1
        assert total + gaps == docs[did], (did, total, gaps, docs[did])
