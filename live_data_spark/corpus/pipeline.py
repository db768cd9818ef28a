"""The LLM-training-data pipeline as a registry project.

This is the integration piece: the extension operators (quality scoring,
fingerprinting, dedup — BASELINE.json's north star) running INSIDE the
dbt-style engine layer the reference workload uses (plans/registry.py) —
layered models, declarative data tests, materialization dispatch. A
corpus refresh is `project.run()` + `project.run_tests()`, exactly like
the bike-shop mart.

Lineage (mirrors the reference's raw → staging → mart shape,
SURVEY.md §1.1):

    source: documents ──► stg_documents (view: normalize + fingerprint)
                            ├─► corpus_clean   (table, lang-partitioned:
                            │                   quality gate)
                            ├─► corpus_deduped (table: exact dedup,
                            │                   keep-min-id per fingerprint)
                            └─► corpus_stats   (table: per lang×source
                                                rollup over the deduped set)

Scale posture: the quality gate is a narrow projection over one scan;
dedup shuffles (fingerprint, doc_id) pairs — 16-byte keys, never text;
corpus_clean partitions by lang so per-language training runs prune whole
partitions; stats aggregate map-side.

The stage logic lives in pure DataFrame→DataFrame transforms so the same
chain runs two ways: materialized through the registry (models below) and
lazily as the oracle-checked catalog query ``corpus_pipeline_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from live_data_spark.catalog import load, register
from live_data_spark.operators.text import _STOPWORDS, fingerprint, normalized_text
from live_data_spark.plans.registry import BuildContext, Project, SourceDef
from live_data_spark.plans.testing import (
    accepted_values,
    not_null,
    relationships,
    singular,
    unique,
)

LANGS = ("en", "de", "es", "fr", "zh")


# -- stage transforms (pure; shared by the registry models and the query) ----


def stage_documents(d: DataFrame) -> DataFrame:
    """Normalize + fingerprint + quality signals, one narrow pass."""
    n_chars = F.length("text").cast("double")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    n_stop = F.regexp_count("text", F.lit(rf"\b({_STOPWORDS})\b")).cast("double")
    n_punct = F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
    return d.select(
        "doc_id",
        "lang",
        "source",
        normalized_text("text").alias("text"),
        fingerprint("text").alias("fp"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.when(
            (n_tokens >= 20)
            & ((n_stop / n_tokens).between(0.01, 0.5) | (F.col("lang") != "en"))
            # empty doc → NULL ratio (fails the predicate) instead of a
            # DIVIDE_BY_ZERO job abort under ANSI mode; n_tokens can't be
            # 0 (split of "" is [""]), so only the chars ratio needs it
            & (F.when(n_chars > 0, n_punct / n_chars) < 0.2),
            1,
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


def quality_gate(stg: DataFrame) -> DataFrame:
    return stg.where(F.col("quality_pass") == 1).drop("quality_pass")


def exact_dedup(clean: DataFrame) -> DataFrame:
    """Keep the min doc_id per content fingerprint — as ONE fp-keyed
    window, not the aggregate-then-self-semi-join form: the join form
    scans the corpus twice and shuffles it twice (the semi join hashes
    the full rows on (fp, doc_id) anyway once survivors outgrow
    broadcast — measured in the plan, 4 scans of documents through the
    manifest), where the window form is a single scan and a single
    full-row shuffle. Hot-fp skew is bounded by the largest duplicate
    cluster; AQE skew-split covers the pathological mirror case.
    """
    from pyspark.sql import Window

    keeper = F.min("doc_id").over(Window.partitionBy("fp"))
    return clean.withColumn("__keep", F.col("doc_id") == keeper).where("__keep").drop("__keep")


def corpus_rollup(deduped: DataFrame) -> DataFrame:
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


# -- the registry project ----------------------------------------------------


def build_corpus_project(spark: SparkSession, warehouse_dir: str, sf_dir: str) -> Project:
    """Assemble the corpus project over a testdata documents table."""
    proj = Project(spark, warehouse_dir=warehouse_dir)
    proj.add_source(SourceDef("testdata", "documents", f"{sf_dir}/documents.parquet"))

    @proj.model(materialized="view")
    def stg_documents(ctx: BuildContext) -> DataFrame:
        return stage_documents(ctx.source("testdata", "documents"))

    @proj.model(materialized="table", partition_by=("lang",))
    def corpus_clean(ctx: BuildContext) -> DataFrame:
        """Quality gate; lang partitions → per-language training prunes."""
        return quality_gate(ctx.ref("stg_documents"))

    @proj.model(materialized="table")
    def corpus_deduped(ctx: BuildContext) -> DataFrame:
        return exact_dedup(ctx.ref("corpus_clean"))

    @proj.model(materialized="table")
    def corpus_selected(ctx: BuildContext) -> DataFrame:
        """DSIR selection over the deduped corpus: importance weights →
        Gumbel-top-k resample under the gram budget (the data-SELECTION
        stage between dedup and mix planning; lazy twin:
        ``corpus_dsir_pipeline_stats``)."""
        from live_data_spark.operators.curation import dsir_log_weights, dsir_select

        ded = ctx.ref("corpus_deduped")
        return dsir_select(dsir_log_weights(ded)).join(
            ded.select("doc_id", "lang", "source", "n_tokens"), "doc_id"
        )

    @proj.model(materialized="table")
    def corpus_stats(ctx: BuildContext) -> DataFrame:
        return corpus_rollup(ctx.ref("corpus_deduped"))

    for t in (
        not_null("stg_documents", "doc_id"),
        unique("source:testdata.documents", "doc_id"),
        accepted_values("stg_documents", "lang", LANGS),
        not_null("corpus_deduped", "doc_id"),
        unique("corpus_deduped", "fp"),
        relationships("corpus_deduped", "doc_id", "corpus_clean", "doc_id"),
        relationships("corpus_selected", "doc_id", "corpus_deduped", "doc_id"),
        relationships("corpus_stats", "source", "corpus_deduped", "source"),
        # singular test (dbt tests/*.sql analog): the materialized stats
        # table must reconcile with a fresh rollup of corpus_deduped —
        # a cross-model invariant no generic test shape can express
        singular("assert_stats_reconcile", "corpus_stats", _stats_reconcile_violations),
    ):
        proj.add_test(t)
    return proj


def _stats_reconcile_violations(proj: Project) -> DataFrame:
    """Violations: (lang, source) groups where the materialized
    corpus_stats disagrees with corpus_rollup recomputed over
    corpus_deduped — catches a stale or partially-written stats table.
    Both sides are (lang × source)-sized aggregates, so the full-outer
    join is tiny regardless of corpus size; eqNullSafe makes a group
    present on only one side a violation."""
    rec = corpus_rollup(proj.relation("corpus_deduped")).select(
        "lang",
        "source",
        F.col("n_docs").alias("r_docs"),
        F.col("total_tokens").alias("r_tokens"),
        F.col("avg_tokens").alias("r_avg"),
    )
    return (
        proj.relation("corpus_stats")
        .join(rec, ["lang", "source"], "full_outer")
        .where(
            ~(
                F.col("n_docs").eqNullSafe(F.col("r_docs"))
                & F.col("total_tokens").eqNullSafe(F.col("r_tokens"))
                & F.col("avg_tokens").eqNullSafe(F.col("r_avg"))
            )
        )
    )


# -- oracle-checked catalog twin --------------------------------------------

_CORPUS_ORACLE = r"""
WITH stg AS (
  SELECT doc_id, lang, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         len(regexp_extract_all(text, '\b(the|a|of|and|is|in|to|for|on|with)\b')) AS n_stop,
         length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
), q AS (
  SELECT doc_id, lang, source, fp, n_tokens
  FROM stg
  WHERE n_tokens >= 20
    AND ((n_stop / n_tokens BETWEEN 0.01 AND 0.5) OR lang <> 'en')
    AND n_punct / n_chars < 0.2
), surv AS (
  SELECT fp, min(doc_id) AS doc_id FROM q GROUP BY fp
), ded AS (
  SELECT q.* FROM q JOIN surv USING (fp, doc_id)
)
SELECT lang, source, count(*) AS n_docs, cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 2) AS avg_tokens
FROM ded GROUP BY lang, source
"""


@register("corpus_pipeline_stats", oracle=_CORPUS_ORACLE, tags=("text", "dedup", "pipeline"))
def corpus_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus pipeline (stage → gate → dedup → rollup) as ONE
    lazy plan — what the registry materializes stepwise, Catalyst here
    collapses into a single optimized query (view-chain inlining, the
    same property dbt view models get from the warehouse)."""
    return corpus_rollup(exact_dedup(quality_gate(stage_documents(load(spark, sf_dir, "documents")))))


def _dsir_pipe_oracle() -> str:
    from live_data_spark.operators.curation import _dsir_sample_sql

    return rf"""
WITH stg AS (
  SELECT doc_id, lang, source,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         len(regexp_extract_all(text, '\b(the|a|of|and|is|in|to|for|on|with)\b')) AS n_stop,
         length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
), q AS (
  SELECT doc_id, lang, source, ntext, fp FROM stg
  WHERE n_tokens >= 20
    AND ((n_stop / n_tokens BETWEEN 0.01 AND 0.5) OR lang <> 'en')
    AND n_punct / n_chars < 0.2
), surv AS (
  SELECT fp, min(doc_id) AS doc_id FROM q GROUP BY fp
), ded AS (
  SELECT q.doc_id, q.lang, q.source, q.ntext AS text FROM q JOIN surv USING (fp, doc_id)
), {_dsir_sample_sql("ded")}
SELECT d.lang, d.source, count(*) AS n_docs, CAST(sum(sel.n_grams) AS BIGINT) AS sel_grams
FROM sel JOIN ded d USING (doc_id)
GROUP BY d.lang, d.source
"""


@register(
    "corpus_dsir_pipeline_stats",
    oracle=_dsir_pipe_oracle(),
    tags=("text", "sampling", "dedup", "pipeline"),
)
def corpus_dsir_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-SELECTION pipeline end-to-end as ONE lazy plan: quality
    gate → exact dedup → DSIR importance weights → Gumbel-top-k resample
    under the 30% gram budget → per-(lang, source) accounting of the
    SELECTED subset. This is ``corpus_pipeline_stats``' story with the
    resampling stage wired in (Xie et al. 2023: weight → sample → mix),
    and the lazy twin of the registry's materialized ``corpus_selected``
    model. Stage plan shapes are documented on their operators
    (stage_documents, exact_dedup, corpus_dsir_weights, dsir_select);
    nothing here adds a corpus-sized shuffle beyond theirs — the final
    rollup is (lang × source)-sized.
    """
    from live_data_spark.operators.curation import dsir_log_weights, dsir_select

    ded = exact_dedup(quality_gate(stage_documents(load(spark, sf_dir, "documents"))))
    sel = dsir_select(dsir_log_weights(ded))
    return (
        sel.join(ded.select("doc_id", "lang", "source"), "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("sel_grams"),
        )
    )


# -- training manifest: the full path from raw docs to batch budgets --------

_MANIFEST_ORACLE = r"""
WITH stg AS (
  SELECT doc_id, lang, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         len(regexp_extract_all(text, '\b(the|a|of|and|is|in|to|for|on|with)\b')) AS n_stop,
         length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
), q AS (
  SELECT doc_id, lang, fp, n_tokens FROM stg
  WHERE n_tokens >= 20
    AND ((n_stop / n_tokens BETWEEN 0.01 AND 0.5) OR lang <> 'en')
    AND n_punct / n_chars < 0.2
), surv AS (
  SELECT fp, min(doc_id) AS doc_id FROM q GROUP BY fp
), ded AS (
  SELECT q.* FROM q JOIN surv USING (fp, doc_id)
), assigned AS (
  SELECT doc_id, lang, n_tokens,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
              WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
              ELSE 'test' END AS split
  FROM ded
), ep AS (
  SELECT split, lang, n_tokens,
         CASE WHEN split = 'train' THEN
           {base}
           + CASE WHEN substr(md5('epoch:' || cast(doc_id AS VARCHAR)), 1, 4) < {thr}
                  THEN 1 ELSE 0 END
         ELSE 1 END AS n_copies
  FROM assigned
)
SELECT split, lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS n_tokens_total,
       cast(sum(n_copies) AS BIGINT) AS n_epoch_docs,
       cast(sum(n_tokens * n_copies) AS BIGINT) AS n_epoch_tokens,
       cast(ceil(sum(n_tokens * n_copies) / 2048.0) AS BIGINT) AS n_seqs_budget
FROM ep GROUP BY split, lang
"""


from live_data_spark.operators.curation import (  # noqa: E402
    _EPOCH_BASE_CASE,
    _EPOCH_THR_CASE,
)


@register(
    "corpus_training_manifest",
    oracle=_MANIFEST_ORACLE.format(base=_EPOCH_BASE_CASE, thr=_EPOCH_THR_CASE),
    headline=True,  # the flagship composition: gate→dedup→split→epochs in one plan
    tags=("text", "dedup", "sampling", "pipeline"),
)
def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data manifest: raw docs → quality gate →
    exact dedup → hash-stratified train/val/test carve → per-lang epoch
    upsampling (train only — eval splits never repeat) → per-(split,
    lang) doc/token accounting and the 2048-token sequence budget. This
    is the one-page answer to "what will this corpus train on?", and it
    is ONE lazy Catalyst plan: every stage is the same operator the
    standalone entries verify individually (corpus_pipeline_stats,
    stratified_eval_split, corpus_epoch_resample, corpus_pack_sequences'
    budget), composed — the view-chain-inlining property the registry's
    stepwise materialization shares.

    Scale: the gate is map-only, dedup shuffles 16-byte (fp, id) pairs,
    the carve and epoch factors are map-side md5 classifications, and
    the manifest aggregate is (splits × langs)-sized. Nothing new
    materializes — this plan reads the corpus exactly once.
    """
    from live_data_spark.operators.curation import epoch_copies_column

    ded = exact_dedup(quality_gate(stage_documents(load(spark, sf_dir, "documents"))))
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    # the SAME epoch-encoding Column the standalone resample entry uses —
    # one Spark source of truth beside _epoch_cases' SQL twin
    n_copies = F.when(split == "train", epoch_copies_column()).otherwise(1)

    ep = ded.select(
        split.alias("split"), "lang", "n_tokens", n_copies.alias("n_copies")
    )
    return ep.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.sum("n_copies").alias("n_epoch_docs"),
        F.sum(F.col("n_tokens") * F.col("n_copies")).alias("n_epoch_tokens"),
        F.ceil(F.sum(F.col("n_tokens") * F.col("n_copies")) / 2048.0)
        .cast("bigint")
        .alias("n_seqs_budget"),
    )
