"""Model/source registry, materialization, and data-test engine.

The Spark-native re-creation of the reference's dbt compile plane
(SURVEY.md §1.4, §2.10): ``source()``/``ref()`` resolution, dependency-
ordered execution, view/table materialization dispatch, and the four
generic data tests compiled to DataFrames expected empty.
"""

from live_data_spark.plans.registry import Project, SourceDef
from live_data_spark.plans.snapshot import read_snapshot, snapshot
from live_data_spark.plans.testing import (
    TestResult,
    accepted_values,
    not_null,
    relationships,
    singular,
    unique,
)

__all__ = [
    "Project",
    "SourceDef",
    "TestResult",
    "accepted_values",
    "not_null",
    "read_snapshot",
    "relationships",
    "singular",
    "snapshot",
    "unique",
]
