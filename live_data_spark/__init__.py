"""live_data_spark — a PySpark-native analytics engine.

Re-expresses the query + data-processing capabilities of the reference repo
``kevinsoenandar-dbt/live_data`` (a dbt + Airflow + Snowflake pipeline) as an
idiomatic Spark engine, and extends it with the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) and Structured
Streaming, all designed for 100 TB scale.

Layout:
- ``session``    — SparkSession factory tuned for scale (AQE, UTC, Arrow).
- ``sources``    — source registry + explicit-schema readers + staged ingestion.
- ``plans``      — dbt-like model registry: ref/source resolution, topo-sort,
                   view/table materialization.
- ``functions``  — Snowflake→Spark dialect translations (decode, exclude, sample).
- ``operators``  — dedup, similarity search, text analysis, multimodal.
- ``streaming``  — Structured Streaming: windows, watermark dedup, sessionization.
- ``testing``    — dbt-style generic data tests (not_null/unique/relationships/
                   accepted_values) compiled to Spark plans.
- ``generator``  — Spark-native mock bike-shop data generator.
"""

__version__ = "0.1.0"
