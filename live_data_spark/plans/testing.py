"""Generic data tests compiled to Spark queries expected to return 0 rows.

The reference declares 20 tests across its sources/staging/mart YAML
(SURVEY.md §5); dbt compiles each into a SELECT whose rows are violations.
Same contract here: ``build(df) -> DataFrame`` of violations; the test
passes iff the DataFrame is empty.

Semantics preserved exactly (these are easy to get subtly wrong):

- ``not_null``        — rows where the column IS NULL.
- ``unique``          — values (non-null, per dbt) appearing more than once.
- ``relationships``   — child FK values (non-null) with no parent: LEFT ANTI
                        join (SURVEY §2.4 J3).
- ``accepted_values`` — values outside the list; **NULLs pass** (dbt quirk,
                        SURVEY §7.2b — a NULL fails not_null, never
                        accepted_values).

Scale: each test is one scan + (for unique/relationships) one key-only
shuffle with map-side combine; violations short-circuit via ``limit`` in
``run`` so a pathological failure doesn't materialize millions of rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from live_data_spark.plans.registry import Project

MAX_FAILURE_SAMPLE = 20


@dataclass(frozen=True)
class TestResult:
    test_name: str
    model: str
    passed: bool
    n_violations: int
    sample: tuple = ()

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        status = "PASS" if self.passed else f"FAIL ({self.n_violations} violations)"
        return f"{self.test_name}[{self.model}]: {status}"


@dataclass(frozen=True)
class GenericTest:
    """A declared test: name, target model/source, violation-query builder."""

    test_name: str
    model: str  # model name, or "source:bike_shop.customers"
    column: str
    params: tuple = ()

    def _target(self, project: "Project") -> DataFrame:
        if self.model.startswith("source:"):
            source_name, table = self.model.removeprefix("source:").split(".", 1)
            return project.read_source(source_name, table)
        return project.relation(self.model)

    def build(self, project: "Project") -> DataFrame:
        raise NotImplementedError

    def run(self, project: "Project") -> TestResult:
        violations = self.build(project)
        # count via limited collect: a passing test touches no extra data,
        # a failing one materializes at most the sample
        sample = violations.limit(MAX_FAILURE_SAMPLE + 1).collect()
        n = len(sample)
        return TestResult(
            test_name=self.test_name,
            model=self.model,
            passed=n == 0,
            n_violations=n,  # ">MAX_FAILURE_SAMPLE" truncated count
            sample=tuple(tuple(r) for r in sample[:MAX_FAILURE_SAMPLE]),
        )


@dataclass(frozen=True)
class NotNullTest(GenericTest):
    def build(self, project: "Project") -> DataFrame:
        return self._target(project).where(F.col(self.column).isNull()).select(self.column)


@dataclass(frozen=True)
class UniqueTest(GenericTest):
    def build(self, project: "Project") -> DataFrame:
        # dbt unique ignores NULLs (they're not_null's job)
        return (
            self._target(project)
            .where(F.col(self.column).isNotNull())
            .groupBy(self.column)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
        )


@dataclass(frozen=True)
class RelationshipsTest(GenericTest):
    """params = (parent_model, parent_column)."""

    def build(self, project: "Project") -> DataFrame:
        parent_model, parent_column = self.params
        child = self._target(project).where(F.col(self.column).isNotNull())
        parent = (
            GenericTest(self.test_name, parent_model, parent_column)
            ._target(project)
            .select(F.col(parent_column).alias("__parent_key"))
        )
        return child.join(
            parent, child[self.column] == parent["__parent_key"], "left_anti"
        ).select(self.column)


@dataclass(frozen=True)
class AcceptedValuesTest(GenericTest):
    """params = tuple of accepted values. NULLs pass (dbt semantics)."""

    def build(self, project: "Project") -> DataFrame:
        return (
            self._target(project)
            .where(~F.col(self.column).isin(*self.params) & F.col(self.column).isNotNull())
            .select(self.column)
        )


# -- declaration helpers (the YAML shorthand) --------------------------------


def not_null(model: str, column: str) -> NotNullTest:
    return NotNullTest(f"not_null_{column}", model, column)


def unique(model: str, column: str) -> UniqueTest:
    return UniqueTest(f"unique_{column}", model, column)


def relationships(model: str, column: str, to_model: str, to_column: str) -> RelationshipsTest:
    return RelationshipsTest(
        f"relationships_{column}__{to_model}_{to_column}",
        model,
        column,
        params=(to_model, to_column),
    )


def accepted_values(model: str, column: str, values: list) -> AcceptedValuesTest:
    return AcceptedValuesTest(f"accepted_values_{column}", model, column, params=tuple(values))
