"""Query catalog: named (Spark query, DuckDB oracle) pairs.

Every operator from SURVEY.md §2 lands here as a registered query over the
driver's TPC-H-ish testdata tables, together with the ANSI-SQL oracle the
driver runs through DuckDB. Keeping both halves in one place keeps column
names/aliases in lockstep (the driver's compare hashes values after sorting
columns by name).

Determinism conventions (so order-insensitive value hashes match):
- Every float aggregate is ``round()``-ed identically on both sides (sum
  order differs between engines; rounding masks the ~1e-9 fp drift).
- Timestamps in output are formatted to strings (session-TZ independent).
- Anything ranked/limited carries a total order (explicit tiebreak keys).
- No nondeterministic functions (rand/uuid/sample) in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: the Spark implementation + its oracle SQL."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver records rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(
            spark=fn, oracle=oracle, headline=headline, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


# The driver's correctness sweep verifies a PREFIX of the catalog (50
# entries in round 1). Entries listed here lead the catalog: everything
# that lacks a green driver row from the previous round — the previously
# unchecked extension surface, the two fixed hash artifacts, and all
# operators new this round. Previously-green entries follow in
# registration order and can rotate out of the checked prefix for a
# round. tests/test_engine.py pins that every name listed exists.
_CHECK_FIRST: tuple[str, ...] = (
    # new in r03: curation + events analytics (never driver-checked)
    "corpus_pack_sequences",
    "corpus_source_cap",
    "text_char_entropy",
    "events_retention_cohorts",
    "events_interarrival_stats",
    "events_session_window_native",
    "embedding_kmeans",
    "semdedup_pairs",
    "events_value_winsorized",
    "langid_confusion",
    "text_ngram_novelty",
    "events_value_histogram_equidepth",
    "events_heavy_hitters",
    "events_heavy_hitters_approx",
    "corpus_chunk_documents",
    "events_rolling_dau",
    "corpus_quality_funnel",
    "embedding_quantize_stats",
    "corpus_priority_sample",
    "corpus_lang_source_chi2",
    "rfm_segments",
    "events_seasonal_anomalies",
    "embedding_label_prototypes",
    "events_type_markov",
    "training_mix_temperature",
    "dedup_rate_by_source",
    "basket_part_pairs",
    "funnel_latency_quantiles",
    "events_rolling_dau_hll",
    "text_compression_ratio",
    "corpus_zipf_slope",
    "events_windowed_topk_users",
    "orders_open_backlog_daily",
    "events_bot_score",
    # dedup ladder (unchecked in r01 except dedup_exact)
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_survivors",
    # similarity / ANN (unchecked in r01; neardup_lsh new in r02)
    "ann_cosine_topk",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "ann_ivf_flat",
    "ann_srp_lsh",
    "embedding_centroid_by_label",
    # multimodal (rows-only, unchecked in r01)
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    # events surface (unchecked in r01)
    "events_hourly_rollup",
    "events_json_props",
    "events_sessionize",
    "events_dedup_latest",
    "events_sliding_rollup",
    "events_funnel",
    # hash-artifact fixes from r01 (values were verified equal; oracle
    # typing fixed in r02)
    "corpus_pipeline_stats",
    "q12_late_shipment_priority",
    # new in r02: remaining TPC-H shapes
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q14_promo_effect",
    "q17_small_quantity",
    "q20_outsized_suppliers",
    "q21_waiting_suppliers",
    # new in r02: training-pipeline text operators
    "text_repetition_ratio",
    "text_pii_scrub_stats",
    "stratified_sample_by_lang",
    "contamination_ngram_overlap",
    "dedup_boilerplate_spans",
    "training_mix_plan",
    "multimodal_header_stats",
    "window_spend_deciles",
    "events_pivot_by_type",
    "events_value_histogram",
    "events_unpivot_type_counts",
    "events_gapfill_hourly",
    "asof_next_event_after_error",
    "events_value_outliers",
    "fuzzy_part_names",
)


def catalog() -> dict[str, QuerySpec]:
    """All registered queries (imports operator modules for side effects).

    Ordering: ``_CHECK_FIRST`` names lead (the driver verifies a prefix),
    then everything else in registration order.
    """
    # Imported lazily so `import live_data_spark` stays cheap.
    from live_data_spark.operators import clustering, curation, dedup, similarity, multimodal, text  # noqa: F401
    from live_data_spark.streaming import events_batch  # noqa: F401
    from live_data_spark.corpus import pipeline  # noqa: F401
    from live_data_spark import queries_analytics, queries_reference, queries_tpch_extra  # noqa: F401

    ordered = {n: _REGISTRY[n] for n in _CHECK_FIRST if n in _REGISTRY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


# events.parquet stores ts as INT64 TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp, so we read nanos as long and rebuild a TIMESTAMP_NTZ at microsecond
# precision with pure integer arithmetic (session-TZ independent; matches
# DuckDB's nanos→micros truncation).
_EVENTS_TS_NTZ = (
    "timestampadd(MICROSECOND, (ts div 1000) % 1000000, "
    "timestampadd(SECOND, ts div 1000000000, TIMESTAMP_NTZ '1970-01-01 00:00:00'))"
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr(_EVENTS_TS_NTZ))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
