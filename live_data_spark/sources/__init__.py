"""File sources & sinks: typed CSV/TSV readers, staged ingestion helpers."""

from live_data_spark.sources.files import read_tsv, stage_files, write_tsv

__all__ = ["read_tsv", "stage_files", "write_tsv"]
