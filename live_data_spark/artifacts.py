"""Versioned model-artifact tables: write-once versions, read-latest.

Trained state (BPE merge tables, NB likelihood grids, classifier
weights, k-means centroids) must outlive the job that fit it — the
pipeline pattern is train-once / score-everywhere. These helpers store
each artifact as a parquet table partitioned by an integer
``__version``: writers only APPEND a new version directory (immutable
history — a scoring job mid-read never sees a half-written update), and
readers prune to one version at the SCAN via the partition filter, so
"latest" costs a directory listing plus one partition's IO no matter how
many versions accumulate.

This is deliberately plain parquet + hive partitioning — the same layout
contract the registry's materializations use — so artifacts are readable
by anything (DuckDB, pandas, another engine) without a format bridge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION_COL = "__version"


def write_artifact(df: DataFrame, path: str, version: int) -> None:
    """Append ``df`` as version ``version`` of the artifact at ``path``.

    Versions are immutable: re-writing an existing version is a caller
    bug (it would APPEND rows into that version's directory), so it is
    rejected here rather than detected downstream.
    """
    spark = df.sparkSession
    existing = list_versions(spark, path)
    if version in existing:
        raise ValueError(f"artifact version {version} already exists at {path}")
    (
        df.withColumn(VERSION_COL, F.lit(int(version)))
        .write.mode("append")
        .partitionBy(VERSION_COL)
        .parquet(path)
    )


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Sorted versions present at ``path`` (empty if the artifact does
    not exist yet). Metadata-only FOR REAL: lists the ``__version=N``
    partition directories through Hadoop's FileSystem API — a
    ``spark.read.parquet(...).distinct()`` here would schedule a scan
    over every version's data files (the metadata-only-query optimizer
    rule is off by default), making each append pay IO proportional to
    the whole artifact history."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    prefix = f"{VERSION_COL}="
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix) and name[len(prefix):].isdigit():
            out.append(int(name[len(prefix):]))
    return sorted(out)


def read_artifact(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """The artifact at ``version`` (default: latest), WITHOUT the version
    column. The version predicate is a partition filter — the scan reads
    exactly one version's files (pinned in tests)."""
    versions = list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no artifact versions at {path}")
    v = versions[-1] if version is None else int(version)
    if v not in versions:
        raise ValueError(f"artifact version {v} not in {versions} at {path}")
    return (
        spark.read.parquet(path)
        .where(F.col(VERSION_COL) == v)
        .drop(VERSION_COL)
    )
