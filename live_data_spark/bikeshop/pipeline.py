"""The ingestion pipeline — the Airflow DAG as a Python runner.

Reference: airflow/dags/refresh_source_data.py (task graph at SURVEY.md
§3.2). Each Airflow task maps to a step of ``BikeShopPipeline.run()``:

  check_conn            → spark.sql("select 1")                  (S8)
  check_tables + branch → per-table existence check              (S7, O1;
                          per-table on purpose — SURVEY §8.3 deviation)
  create_tables         → idempotent empty-parquet raw tables    (S6)
  get_existing_customers→ deterministic 5% sample LIMIT 50       (L1, L2)
  get_*_data            → MockDataSpark seed/refresh             (O2)
  get_files_list        → walk generated dir, skip static
                          products on refresh                    (O6)
  stage_file.expand     → gzip into stage dir                    (S4, O3)
  copy_file.expand      → schema-enforced TSV read → APPEND      (S5, X3)
  remove_staged/clean   → directory cleanup                      (S9, S10)

The XCom hops (O4) are plain Python values; dynamic task mapping (O3) is
a loop — Spark parallelizes within each load, which is where the work is.

Scale: each COPY is `read.csv(schema).write.mode("append")` — at 100 TB
the landing files arrive partitioned and the append is a parallel
file-commit, no shuffle at all. Raw tables are plain parquet dirs;
downstream models prune columns against them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from live_data_spark.bikeshop.generator import MockDataSpark
from live_data_spark.bikeshop.schema import RAW_SCHEMAS, RAW_TABLES
from live_data_spark.sources.files import clean_dir, read_tsv, stage_files, write_tsv


@dataclass
class BikeShopPipeline:
    """One runner = one DAG; ``run()`` = one (serialized) DAG run (O5)."""

    spark: SparkSession
    root: str  # working root: raw/, generated/, stage/ live under it
    seed: int = 42
    runs_completed: int = field(default=0, init=False)

    @property
    def raw_dir(self) -> Path:
        return Path(self.root) / "raw"

    @property
    def generated_dir(self) -> Path:
        return Path(self.root) / "generated"

    @property
    def stage_dir(self) -> Path:
        return Path(self.root) / "stage"

    # -- individual tasks --------------------------------------------------

    def check_conn(self) -> None:
        """S8: `select 1` healthcheck (check_conn.sql:1)."""
        assert self.spark.sql("select 1").collect()[0][0] == 1

    def table_exists(self, table: str) -> bool:
        """S7/O1 — per-table, not schema-level (SURVEY §8.3 deviation:
        the reference skips creation if ANY table exists in the schema).
        """
        return (self.raw_dir / table / "_SUCCESS").exists()

    def create_tables(self) -> None:
        """S6: CREATE TABLE IF NOT EXISTS — empty parquet with the
        declared schema (create_tables.sql + mock_schema.py)."""
        for table, schema in RAW_SCHEMAS.items():
            if not self.table_exists(table):
                empty = self.spark.createDataFrame([], schema)
                empty.write.mode("overwrite").parquet(str(self.raw_dir / table))

    def read_raw(self, table: str) -> DataFrame:
        return self.spark.read.schema(RAW_SCHEMAS[table]).parquet(str(self.raw_dir / table))

    def get_existing_customers(self) -> DataFrame:
        """L1/L2: SAMPLE (5) LIMIT 50 returning-customer pick
        (sample_table.sql:3-5). Deterministic hash-sample (Bernoulli is
        engine-nondeterministic — dialect.deterministic_sample rationale);
        the string UUID key is hashed to an integer first. LIMIT keeps
        the pool bounded exactly like the reference.
        """
        from pyspark.sql import functions as F

        c = self.read_raw("customers")
        h = F.pmod(F.xxhash64("id", F.lit(self.seed)), F.lit(100))
        return c.where(h < 5).limit(50).select("id")

    def generate(self, initial: bool) -> list[str]:
        """O2: initial seed vs refresh batch; writes TSVs (S3) and returns
        the file list (get_files_list), applying the static-dim skip (O6).
        """
        # per-run load timestamp (the reference stamps now() each DAG run;
        # deterministic analog: base + run index)
        import datetime as _dt

        gen = MockDataSpark(
            self.spark,
            seed=self.seed + self.runs_completed,
            loaded_at=_dt.datetime(2026, 8, 13) + _dt.timedelta(minutes=self.runs_completed),
        )
        if initial:
            frames = gen.seed_initial()
        else:
            frames = gen.refresh(
                self.get_existing_customers(),
                batch=self.runs_completed,
                products=self.read_raw("products"),
            )
        for table, df in frames.items():
            write_tsv(df, str(self.generated_dir / table))
        return sorted(frames)  # products absent on refresh → O6 for free

    def copy_into(self, table: str) -> int:
        """S5/X3: COPY INTO — staged gz TSV, explicit schema, APPEND."""
        df = read_tsv(self.spark, str(self.stage_dir / table), RAW_SCHEMAS[table])
        df.write.mode("append").parquet(str(self.raw_dir / table))
        return self.read_raw(table).count()

    # -- the DAG -----------------------------------------------------------

    def run(self) -> dict[str, int]:
        """One DAG run; returns per-table row counts after the load."""
        self.check_conn()
        initial = not all(self.table_exists(t) for t in RAW_TABLES)
        if initial:
            self.create_tables()
        tables = self.generate(initial)
        stage_files(str(self.generated_dir), str(self.stage_dir))
        counts = {t: self.copy_into(t) for t in tables}
        clean_dir(str(self.stage_dir))
        clean_dir(str(self.generated_dir))
        self.runs_completed += 1
        return counts
