"""Data-profiling operators: table column stats and join-key skew.

The ANALYZE/DESCRIBE tier every engine needs before planning a 100 TB
job: per-column statistics (null rates, exact distincts, value bounds)
and join-key frequency skew (the number that decides whether a join
needs salting or AQE skew handling — see functions/skew.py for the
mitigation this profiler justifies).

Both are single-pass shapes: column stats compute every aggregate in ONE
wide aggregation then unpivot the 1-row result (never one scan per
column); key-skew stacks the key columns into (key_name, key) rows so
one shuffle covers all keys. Exact distinct counts are the
oracle-checkable tier — at true scale swap ``approx_count_distinct``
(the ``agg_approx_distinct_users`` precedent) into the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from live_data_spark.catalog import load, register

_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")

_PROFILE_ORACLE = """
WITH s AS (
  SELECT count(*) AS n_rows,
         count(doc_id) AS nn_doc_id, count(DISTINCT doc_id) AS nd_doc_id,
           cast(min(doc_id) AS VARCHAR) AS mn_doc_id, cast(max(doc_id) AS VARCHAR) AS mx_doc_id,
         count(lang) AS nn_lang, count(DISTINCT lang) AS nd_lang,
           cast(min(lang) AS VARCHAR) AS mn_lang, cast(max(lang) AS VARCHAR) AS mx_lang,
         count(source) AS nn_source, count(DISTINCT source) AS nd_source,
           cast(min(source) AS VARCHAR) AS mn_source, cast(max(source) AS VARCHAR) AS mx_source,
         count(n_chars) AS nn_n_chars, count(DISTINCT n_chars) AS nd_n_chars,
           cast(min(n_chars) AS VARCHAR) AS mn_n_chars, cast(max(n_chars) AS VARCHAR) AS mx_n_chars
  FROM documents
)
SELECT 'doc_id' AS col_name, n_rows, n_rows - nn_doc_id AS n_null,
       nd_doc_id AS n_distinct, mn_doc_id AS min_value, mx_doc_id AS max_value FROM s
UNION ALL
SELECT 'lang', n_rows, n_rows - nn_lang, nd_lang, mn_lang, mx_lang FROM s
UNION ALL
SELECT 'source', n_rows, n_rows - nn_source, nd_source, mn_source, mx_source FROM s
UNION ALL
SELECT 'n_chars', n_rows, n_rows - nn_n_chars, nd_n_chars, mn_n_chars, mx_n_chars FROM s
"""


@register("profile_table_stats", oracle=_PROFILE_ORACLE, tags=("profiling", "agg"))
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``documents``: row count, null count, exact
    distinct count, min/max (stringified so heterogeneous column types
    share one schema) — the ANALYZE TABLE shape that feeds CBO stats,
    layout choices (which column to Z-order on), and data-quality
    dashboards.

    ONE wide aggregation computes all 4 columns' stats in a single
    corpus pass (map-side partials; the distincts expand internally but
    share the scan), and the 1-row result unpivots driver-free via an
    in-plan union of 1-row projections. ``text`` is profiled by its
    derived ``n_chars`` — min/max over multi-KB strings would ship
    document bodies through the aggregate for no statistical value.
    """
    d = load(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    s = d.agg(*aggs)
    parts = [
        s.select(
            F.lit(c).alias("col_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


_SKEW_KEYS = ("l_partkey", "l_suppkey", "l_orderkey")

_SKEW_ORACLE = """
WITH stacked AS (
  SELECT 'l_partkey' AS key_name, l_partkey AS key FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
  UNION ALL SELECT 'l_orderkey', l_orderkey FROM lineitem
), freq AS (
  SELECT key_name, key, count(*) AS f FROM stacked GROUP BY 1, 2
), agg AS (
  SELECT key_name, cast(sum(f) AS BIGINT) AS n_rows, count(*) AS n_keys,
         cast(max(f) AS BIGINT) AS max_freq
  FROM freq GROUP BY 1
), top AS (
  SELECT f.key_name, min(f.key) AS top_key
  FROM freq f JOIN agg a ON f.key_name = a.key_name AND f.f = a.max_freq
  GROUP BY 1
)
SELECT a.key_name, a.n_rows, a.n_keys, a.max_freq,
       round(a.max_freq * a.n_keys / cast(a.n_rows AS DOUBLE), 4) AS skew_ratio,
       t.top_key
FROM agg a JOIN top t USING (key_name)
"""


@register("profile_join_key_skew", oracle=_SKEW_ORACLE, tags=("profiling", "agg", "join"))
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem's three join keys: rows, key
    cardinality, hottest-key frequency, and skew ratio
    (max_freq / mean_freq — 1.0 is perfectly uniform; the number that
    decides between a plain shuffle join, AQE skew splitting, and
    explicit salting, cf. functions/skew.py). ``top_key`` identifies the
    culprit (min key id among ties, so the output is deterministic).

    Single pass: the three key columns stack into (key_name, key) rows —
    3× the rows but ONE shuffle keyed on (key_name, key) with map-side
    combine, instead of three scans; the per-key frequency table then
    reduces to 3 rows. The hot-key lookup joins freq back to the 3-row
    aggregate (broadcast) rather than re-deriving frequencies.
    """
    li = load(spark, sf_dir, "lineitem")
    stack_expr = ", ".join(f"'{k}', {k}" for k in _SKEW_KEYS)
    stacked = li.select(
        F.expr(f"stack({len(_SKEW_KEYS)}, {stack_expr}) AS (key_name, key)")
    )
    freq = stacked.groupBy("key_name", "key").agg(F.count(F.lit(1)).alias("f"))
    agg = freq.groupBy("key_name").agg(
        F.sum("f").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("f").alias("max_freq"),
    )
    top = (
        freq.join(
            F.broadcast(agg.select("key_name", "max_freq")),
            ["key_name"],
        )
        .where(F.col("f") == F.col("max_freq"))
        .groupBy("key_name")
        .agg(F.min("key").alias("top_key"))
    )
    return (
        agg.join(F.broadcast(top), "key_name")
        .select(
            "key_name",
            "n_rows",
            "n_keys",
            "max_freq",
            F.round(
                F.col("max_freq") * F.col("n_keys") / F.col("n_rows").cast("double"), 4
            ).alias("skew_ratio"),
            "top_key",
        )
    )


# ---------------------------------------------------------------------------
# Metric correlation — Pearson r from integer sums (engine-exact).
# ---------------------------------------------------------------------------

_CORR_ORACLE = r"""
WITH m AS (
  SELECT cast(n_chars AS BIGINT) AS x,
         cast(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT cast(count(*) AS BIGINT) AS n,
         cast(sum(x) AS BIGINT) AS sx, cast(sum(y) AS BIGINT) AS sy,
         cast(sum(x * y) AS BIGINT) AS sxy,
         cast(sum(x * x) AS BIGINT) AS sxx, cast(sum(y * y) AS BIGINT) AS syy
  FROM m
)
SELECT n AS n_docs,
       round((n * sxy - sx * sy)
             / NULLIF(sqrt(cast(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(cast(n * syy - sy * sy AS DOUBLE)), 0), 6)
         AS corr_chars_tokens
FROM s
"""


@register("profile_metric_correlation", oracle=_CORR_ORACLE, tags=("profiling", "agg"))
def profile_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between document length (chars) and whitespace
    token count — the redundancy check that decides whether two quality
    features earn separate thresholds or collapse into one. Computed
    from INTEGER sums (n, Σx, Σy, Σxy, Σx², Σy²) so both engines form
    the same exact integers; sqrt/division over identical values is
    bit-identical (the reason this avoids `corr()`: its streaming
    accumulation order is engine-specific). Zero-variance inputs yield
    NULL (NULLIF), not a division abort.

    Scale: one map-side-combined aggregate to a single row. Extending to
    a k×k feature matrix is the same plan with k(k+1)/2 sum columns.
    """
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    x = F.col("n_chars").cast("bigint")
    y = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    m = d.select(x.alias("x"), y.alias("y"))
    s = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    denom = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.when(denom != 0, denom),
            6,
        ).alias("corr_chars_tokens"),
    )
