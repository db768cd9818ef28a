"""The reference workload end-to-end: bike-shop raw → staging → mart.

Everything the reference's Airflow DAG + dbt project does, re-expressed on
this engine: Spark-native mock-data generation, staged TSV ingestion with
append loads, the 8 dbt models, and the 20 declared data tests.
"""

from live_data_spark.bikeshop.models import build_project
from live_data_spark.bikeshop.pipeline import BikeShopPipeline

__all__ = ["BikeShopPipeline", "build_project"]
